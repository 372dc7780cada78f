"""Planted-fixture and plan-shape tests for the Table I ops
(engine/tablei.py): the oracle pre-flight proves Spark ≡ DuckDB; these
prove the shared semantics are the INTENDED ones and the plans keep
their 100 TB shape."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from engine.registry import all_queries

from .conftest import SF_SMOKE

QUERIES = all_queries()


def _write(spark, tmp_path, table: str, df) -> str:
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/{table}.parquet")
    return sf_dir


def _plan(spark, key: str) -> str:
    df = QUERIES[key](spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, value double",
    ).select(
        "event_id",
        F.timestamp_micros("ts_us").alias("ts"),
        "user_id",
        "event_type",
        F.col("value"),
        F.lit("{}").alias("props"),
    )


# --------------------------------------------------------------------------
# agg_countmin_heavy
# --------------------------------------------------------------------------


def test_countmin_guarantee_and_top_selection(spark):
    rows = QUERIES["agg_countmin_heavy"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        # the one-sided CM error bound is structural, not probabilistic
        assert r["cm_est"] >= r["exact_cnt"]
        assert r["overcount"] == r["cm_est"] - r["exact_cnt"] >= 0


def test_countmin_probe_broadcasts_sketch(spark):
    # the 256-cell sketch must be the build side of a broadcast join —
    # a shuffle join against a constant-size relation is the wrong plan
    assert "BroadcastHashJoin" in _plan(spark, "agg_countmin_heavy")


# --------------------------------------------------------------------------
# text_readability
# --------------------------------------------------------------------------


def test_readability_planted_formula(spark, tmp_path):
    # "go. go. go" -> words=3, sentence-runs=2, vowel-groups=3
    # flesch = 206.835 - 1.015*(3/2) - 84.6*(3/3) = 120.7125
    # grade  = 0.39*(3/2) + 11.8*(3/3) - 15.59 = -3.205
    docs = spark.createDataFrame(
        [(1, "go. go. go", "en", "sA", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    row = QUERIES["text_readability"](spark, sf).collect()[0]
    assert row["n_docs"] == 1
    assert row["avg_flesch"] == pytest.approx(120.7125, abs=1e-4)
    assert row["avg_fk_grade"] == pytest.approx(-3.205, abs=1e-4)


def test_readability_unpunctuated_doc_counts_one_sentence(spark, tmp_path):
    # no terminal punctuation -> sentence floor of 1, not div-by-zero
    docs = spark.createDataFrame(
        [(1, "aa bb", "en", "sA", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    row = QUERIES["text_readability"](spark, sf).collect()[0]
    # words=2, sents=1, sylls=1 ("bb" has no vowel group):
    # flesch = 206.835 - 1.015*2 - 84.6*0.5 = 162.505
    assert row["avg_flesch"] == pytest.approx(162.505, abs=1e-4)


# --------------------------------------------------------------------------
# agg_dup_profile
# --------------------------------------------------------------------------


def test_dup_profile_planted_clusters(spark, tmp_path):
    shared = "x" * 40  # identical 40-char prefix -> one cluster
    docs = spark.createDataFrame(
        [
            (1, shared + " tail one", "en", "sA", 49),
            (2, shared + " tail two", "en", "sA", 49),
            (3, "unique doc three " + "y" * 30, "en", "sA", 47),
            (4, "unique doc four " + "z" * 30, "en", "sA", 46),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    got = {r["cluster_size"]: r for r in QUERIES["agg_dup_profile"](spark, sf).collect()}
    assert got[1]["n_clusters"] == 2 and got[1]["n_docs"] == 2
    assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
    assert got[2]["corpus_share"] == pytest.approx(0.5, abs=1e-6)


# --------------------------------------------------------------------------
# pipeline_domain_mix_weights
# --------------------------------------------------------------------------


def test_mix_weights_planted_targets(spark, tmp_path):
    # en 6 docs, fr 2, de 2 -> N=10, K=3: en target .30, others .35 each
    rows = [(i, f"doc {i}", lang, "sA", 5) for i, lang in enumerate(
        ["en"] * 6 + ["fr"] * 2 + ["de"] * 2
    )]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = _write(spark, tmp_path, "documents", docs)
    got = {r["lang"]: r for r in QUERIES["pipeline_domain_mix_weights"](spark, sf).collect()}
    assert got["en"]["weight"] == pytest.approx(0.5, abs=1e-6)  # .3*10/6
    assert got["fr"]["weight"] == pytest.approx(1.75, abs=1e-6)  # .35*10/2
    assert got["en"]["expected_docs"] == 3
    assert got["fr"]["expected_docs"] == 4  # round(3.5) half-up


def test_mix_weights_caps_at_three_epochs(spark, tmp_path):
    # fr has 1 doc of 20: uncapped weight would be .35*20 = 7 -> capped 3
    rows = [(i, f"doc {i}", "en", "sA", 5) for i in range(18)]
    rows += [(18, "doc fr", "fr", "sA", 5), (19, "doc de", "de", "sA", 5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = _write(spark, tmp_path, "documents", docs)
    got = {r["lang"]: r for r in QUERIES["pipeline_domain_mix_weights"](spark, sf).collect()}
    assert got["fr"]["weight"] == pytest.approx(3.0, abs=1e-6)
    assert got["fr"]["expected_docs"] == 3


# --------------------------------------------------------------------------
# win_moving_median
# --------------------------------------------------------------------------


def test_moving_median_planted(spark, tmp_path):
    rows = [(1, 1_000_000, 7, "view", 1.0), (2, 2_000_000, 7, "view", 100.0),
            (3, 3_000_000, 7, "view", 2.0)]
    sf = _write(spark, tmp_path, "events", _events_df(spark, rows))
    got = {r["event_id"]: r["mov_median"]
           for r in QUERIES["win_moving_median"](spark, sf).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(50.5)  # interpolated even-count median
    assert got[3] == pytest.approx(2.0)  # spike shrugged off


# --------------------------------------------------------------------------
# win_rolling_slope
# --------------------------------------------------------------------------


def test_rolling_slope_recovers_linear_signal(spark, tmp_path):
    # y = 2x + 1 exactly -> slope 2 wherever n >= 2; NULL at n = 1
    rows = [(i, i * 1_000_000, 7, "view", 2.0 * (i + 1) + 1.0) for i in range(12)]
    sf = _write(spark, tmp_path, "events", _events_df(spark, rows))
    got = {r["event_id"]: r["slope"]
           for r in QUERIES["win_rolling_slope"](spark, sf).collect()}
    assert got[0] is None
    for eid in range(1, 12):
        assert got[eid] == pytest.approx(2.0, abs=1e-6)


# --------------------------------------------------------------------------
# graph_kcore_peel
# --------------------------------------------------------------------------


def test_kcore_planted_k4_survives_pendant_peels(spark, tmp_path):
    # day1 ring over users 1..5 (order 1,2,3,4,5): 12 23 34 45 15
    # day2 ring over users 1..4 (order 1,3,2,4):   13 23 24 14
    # distinct undirected = K4 on {1,2,3,4} + pendant edges 45, 15
    # round 0: 5 nodes / 8 edges; round 1 peels node 5 (deg 2 < 3);
    # rounds 1..8 hold the K4: 4 nodes / 6 edges.
    day1, day2 = 86_400_000_000 * 20_000, 86_400_000_000 * 20_001
    rows, eid = [], 0
    for pos, user in enumerate([1, 2, 3, 4, 5]):
        for k in range(3):  # >= 3 events to enter the cohort
            rows.append((eid, day1 + pos * 1_000_000 + k, user, "view", 1.0))
            eid += 1
    for pos, user in enumerate([1, 3, 2, 4]):
        for k in range(3):
            rows.append((eid, day2 + pos * 1_000_000 + k, user, "view", 1.0))
            eid += 1
    sf = _write(spark, tmp_path, "events", _events_df(spark, rows))
    traj = {r["round"]: (r["nodes_alive"], r["edges_alive"])
            for r in QUERIES["graph_kcore_peel"](spark, sf).collect()}
    assert traj[0] == (5, 8)
    for r in range(1, 9):
        assert traj[r] == (4, 6)


def test_kcore_driver_and_distributed_paths_agree(spark):
    from engine.analytics import materialize_affinity_edges
    from engine.session import scratch_cache
    from engine.tablei import _kcore_distributed, _kcore_driver

    edges = materialize_affinity_edges(spark, SF_SMOKE)
    und = scratch_cache(
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ).distinct()
    )
    assert _kcore_driver(und) == _kcore_distributed(und)
