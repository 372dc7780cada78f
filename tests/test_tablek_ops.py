"""Planted-fixture and property tests for the Table K ops
(engine/tablek.py). The oracle pre-flight proves Spark ≡ DuckDB; these
prove the shared semantics are the INTENDED ones."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from engine.registry import all_queries

from .conftest import SF_SMOKE

QUERIES = all_queries()


def _write(spark, tmp_path, table: str, df) -> str:
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/{table}.parquet")
    return sf_dir


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


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# --------------------------------------------------------------------------
# graph_hits_topk: independent Python recomputation on the real graph
# --------------------------------------------------------------------------


def test_hits_matches_python_recurrence(spark):
    """Collect the weighted affinity edges and replay the 2-iteration
    unnormalized HITS recurrence in plain Python; the key's top-20 of
    each role must match exactly (scores are exact integers)."""
    from engine.analytics import materialize_affinity_edges

    edges = materialize_affinity_edges(spark, SF_SMOKE)
    w = Counter()
    for r in edges.select("src", "dst").collect():
        w[(r["src"], r["dst"])] += 1
    h = {u: 1 for (u, _v) in w}
    for _half in range(2):
        a = defaultdict(int)
        for (u, v), wt in w.items():
            a[v] += wt * h.get(u, 0)
        h = defaultdict(int)
        for (u, v), wt in w.items():
            h[u] += wt * a.get(v, 0)
    exp_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    exp_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = QUERIES["graph_hits_topk"](spark, SF_SMOKE).collect()
    got_h = [(r["user_id"], r["score"]) for r in rows if r["role"] == "hub"]
    got_a = [
        (r["user_id"], r["score"]) for r in rows if r["role"] == "authority"
    ]
    assert got_h == exp_h
    assert got_a == exp_a


# --------------------------------------------------------------------------
# agg_funnel_paths_top: planted sessions
# --------------------------------------------------------------------------


def test_funnel_paths_planted_sessions(spark, tmp_path):
    """One user runs A,B,C,A,B,C in a single session (paths ABC×2, BCA,
    CAB), then after a 2-hour gap runs X,Y,Z (path XYZ) — the gap must
    break the path chain, so no path spans the two sessions."""
    us = 1_000_000
    rows, t = [], 0
    for i, et in enumerate("ABCABC"):
        rows.append((i, t, 1, et, 1.0))
        t += 60 * us
    t += 2 * 3600 * us
    for i, et in enumerate("XYZ"):
        rows.append((10 + i, t, 1, et, 1.0))
        t += 60 * us
    sf = _write(spark, tmp_path, "events", _events_df(spark, rows))
    got = {
        (r["step1"], r["step2"], r["step3"]): r["cnt"]
        for r in QUERIES["agg_funnel_paths_top"](spark, sf).collect()
    }
    assert got == {
        ("A", "B", "C"): 2,
        ("B", "C", "A"): 1,
        ("C", "A", "B"): 1,
        ("X", "Y", "Z"): 1,
    }


# --------------------------------------------------------------------------
# pipeline_preference_pairs: planted quality groups
# --------------------------------------------------------------------------


def test_preference_pairs_planted(spark, tmp_path):
    """Group g1 has a clear best (all stopwords) and worst (none) →
    one pair; group g2 is constant-score → filtered by the margin."""

    def doc(i, text, src):
        return (i, text, "en", src, len(text))

    docs = _docs_df(
        spark,
        [
            doc(1, "the of and to in", "g1"),  # score 1.0
            doc(2, "zebra quark nebula fjord", "g1"),  # score 0.0
            doc(3, "the zebra of quark", "g1"),  # score 0.5
            doc(4, "same same same same", "g2"),
            doc(5, "equal equal equal equal", "g2"),
        ],
    )
    sf = _write(spark, tmp_path, "documents", docs)
    rows = QUERIES["pipeline_preference_pairs"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source"], r["chosen_doc"], r["rejected_doc"]) == ("g1", 1, 2)
    assert r["chosen_score"] == 1.0 and r["rejected_score"] == 0.0
    assert r["margin"] == 1.0


# --------------------------------------------------------------------------
# pipeline_curriculum_schedule: planted difficulty ladder
# --------------------------------------------------------------------------


def test_curriculum_planted_quartiles(spark, tmp_path):
    """8 docs with strictly increasing mean word length → NTILE(4) puts
    exactly 2 per phase in difficulty order, budgets = word sums."""
    docs = []
    for i in range(8):
        word = "x" * (i + 2)
        text = " ".join([word] * 5)  # 5 words, mean length i+2
        docs.append((i, text, "en", "web", len(text)))
    sf = _write(spark, tmp_path, "documents", _docs_df(spark, docs))
    rows = QUERIES["pipeline_curriculum_schedule"](spark, sf).collect()
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    assert all(r["n_docs"] == 2 for r in rows)
    assert all(r["token_budget"] == 10 for r in rows)
    diffs = [r["avg_difficulty"] for r in rows]
    assert diffs == sorted(diffs) and diffs[0] < diffs[-1]


# --------------------------------------------------------------------------
# text_dp_bigram_release: release bounds + suppression
# --------------------------------------------------------------------------


def test_dp_release_thresholds_and_never_leaks(spark, tmp_path):
    """A bigram with true count 20 must be released with |noise| <= 4;
    one with true count 5 can never clear the 12 threshold."""
    docs = [(1, " ".join(["alpha beta"] * 20), "en", "web", 1)]
    docs.append((2, " ".join(["rare pair"] * 5), "en", "web", 1))
    sf = _write(spark, tmp_path, "documents", _docs_df(spark, docs))
    got = {
        r["bigram"]: r["noisy_count"]
        for r in QUERIES["text_dp_bigram_release"](spark, sf).collect()
    }
    assert "rare pair" not in got
    assert 16 <= got["alpha beta"] <= 24
    # the inner bigrams of the repeated phrase ("beta alpha") have
    # count 19 — anything released must be within the noise envelope
    for bg, noisy in got.items():
        assert noisy >= 12


# --------------------------------------------------------------------------
# sim_srp_hamming_topk: planted identical + antipodal vectors
# --------------------------------------------------------------------------


def test_srp_identical_and_antipodal(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.uniform(-1, 1, 64).astype("float32")
    vecs = [
        (0, [float(x) for x in base], 0),
        (1, [float(x) for x in base], 0),  # identical -> hamming 0
        (2, [float(-x) for x in base], 0),  # antipodal -> near 64
        (3, [float(x) for x in rng.uniform(-1, 1, 64)], 0),
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    sf = _write(spark, tmp_path, "embeddings", emb)
    rows = QUERIES["sim_srp_hamming_topk"](spark, sf).collect()
    got = {r["vec_id"]: r["hamming"] for r in rows}
    assert got[1] == 0
    assert got[2] >= 56  # sign flips every nonzero projection
    assert rows[0]["vec_id"] == 1  # identical vector ranks first


# --------------------------------------------------------------------------
# scan_file_skip_stats: internal consistency + direct recount
# --------------------------------------------------------------------------


def test_file_skip_stats_consistency(spark):
    [r] = QUERIES["scan_file_skip_stats"](spark, SF_SMOKE).collect()
    assert r["n_files"] == r["files_skipped"] + r["files_scanned"]
    assert 0 <= r["rows_matching"] <= r["rows_scanned"]
    from engine.session import T

    li = T(spark, SF_SMOKE, "lineitem")
    direct = li.filter(
        F.col("l_shipdate").between("1995-01-01", "1995-03-31")
    ).count()
    # zone-map skipping never drops matching rows
    assert r["rows_matching"] == direct


# --------------------------------------------------------------------------
# sample_kfold_stratified: partition + hash stability
# --------------------------------------------------------------------------


def test_kfold_partition_and_stability(spark):
    rows = QUERIES["sample_kfold_stratified"](spark, SF_SMOKE).collect()
    per_lang = defaultdict(int)
    for r in rows:
        assert 0 <= r["fold"] < 5 and r["spread_from_min"] >= 0
        per_lang[r["lang"]] += r["n_docs"]
    from engine.session import T

    truth = {
        r["lang"]: r["n"]
        for r in T(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert dict(per_lang) == truth
    # assignment is a pure hash of doc_id: recompute one stratum in python
    docs = (
        T(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
    )
    lang0 = docs[0]["lang"]
    exp = Counter(
        int(hashlib.md5(f"fold:{d['doc_id']}".encode()).hexdigest()[:15], 16)
        % 5
        for d in docs
        if d["lang"] == lang0
    )
    got = {r["fold"]: r["n_docs"] for r in rows if r["lang"] == lang0}
    assert got == dict(exp)


# --------------------------------------------------------------------------
# win_rolling_corr: bounds + full windows only
# --------------------------------------------------------------------------


def test_rolling_corr_bounds_and_full_windows(spark):
    rows = QUERIES["win_rolling_corr"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["corr24"] <= 1.0
    # full windows only: per type, the first 23 hours emit no row
    from engine.canon import floordiv_sql
    from engine.session import T

    hourly = (
        T(spark, SF_SMOKE, "events")
        .groupBy(
            "event_type",
            floordiv_sql("unix_micros(ts)", 3_600_000_000).alias("hr"),
        )
        .count()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_hours"))
        .collect()
    )
    emitted = Counter(r["event_type"] for r in rows)
    for h in hourly:
        assert emitted[h["event_type"]] <= max(0, h["n_hours"] - 23)
