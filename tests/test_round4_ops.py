"""Planted-fixture property tests for the round-4 Table G ops: the
oracle pre-flight proves Spark ≡ DuckDB; these prove the shared
semantics are the INTENDED ones (a formula bug both engines agree on
would pass the oracle and fail here)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from engine.registry import all_queries

QUERIES = all_queries()


def _write_sf(spark, tmp_path, table: str, df) -> str:
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/{table}.parquet")
    return sf_dir


def test_mad_outliers_flags_planted_extremes(spark, tmp_path):
    rows = []
    # type A: tight cluster around 10 (mad > 0) + 3 planted extremes
    for i in range(100):
        rows.append((i, 1_700_000_000_000_000 + i * 1_000_000, i % 7, "A",
                     10.0 + (i % 5) * 0.01))
    for j, val in enumerate((1000.0, -990.0, 500.0)):
        rows.append((900 + j, 1_700_000_000_000_000, 1, "A", val))
    # type B: constant except one row — mad is 0, any deviation flags
    for i in range(50):
        rows.append((2000 + i, 1_700_000_000_000_000, 2, "B", 5.0))
    rows.append((2999, 1_700_000_000_000_000, 2, "B", 5.1))
    # type C: perfectly uniform — nothing may flag
    for i in range(40):
        rows.append((3000 + i, 1_700_000_000_000_000, 3, "C", 7.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, value double"
    ).select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id",
        "event_type", "value",
    )
    sf = _write_sf(spark, tmp_path, "events", ev)
    got = {r["event_type"]: r for r in QUERIES["win_mad_outliers"](spark, sf).collect()}
    assert got["A"]["n_outliers"] == 3
    assert got["B"]["n_outliers"] == 1  # mad=0: any deviation is an outlier
    assert got["B"]["mad"] == 0.0
    assert got["C"]["n_outliers"] == 0


def test_bpe_pair_counts_planted(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b a b", "en", "s", 7), (2, "a b c", "en", "s", 5),
         (3, "solo", "en", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path, "documents", docs)
    rows = QUERIES["pipeline_bpe_pair_counts"](spark, sf).collect()
    got = {(r["pair"]): (r["cnt"], r["rnk"]) for r in rows}
    assert got["a b"] == (3, 1)   # doc1 ×2 + doc2 ×1
    assert got["b a"] == (1, 2)   # tie with 'b c' broken pair-asc
    assert got["b c"] == (1, 3)
    assert len(rows) == 3         # single-token doc contributes nothing


def test_keep_best_dedup_keeps_longest(spark, tmp_path):
    # docs 1/2 share the identical distinct-token set (same simhash);
    # doc 2 is longer and must be the keeper despite the higher id
    docs = spark.createDataFrame(
        [(1, "x y z", "en", "s", 5), (2, "z y x x", "en", "s", 50),
         (3, "totally different words here", "en", "s", 28)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path, "documents", docs)
    rows = QUERIES["pipeline_keep_best_dedup"](spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["keeper_doc_id"] == 2
    assert rows[0]["n_dropped"] == 1
    assert rows[0]["dropped"] == "1"


def test_entropy_planted_distributions(spark, tmp_path):
    rows = []
    for i in range(40):  # source 'half': 50/50 en/es -> H = ln 2
        rows.append((i, "t", "en" if i % 2 == 0 else "es", "half", 1))
    for i in range(30):  # source 'mono': single lang -> H = 0
        rows.append((100 + i, "t", "en", "mono", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = _write_sf(spark, tmp_path, "documents", docs)
    got = {r["source"]: r for r in QUERIES["agg_entropy"](spark, sf).collect()}
    assert got["mono"]["lang_entropy"] == 0.0
    assert abs(got["half"]["lang_entropy"] - math.log(2)) < 1e-6
    assert got["half"]["n_langs"] == 2 and got["half"]["n_docs"] == 40
