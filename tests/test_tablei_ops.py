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


# --------------------------------------------------------------------------
# agg_kmv_set_sketch
# --------------------------------------------------------------------------


def test_kmv_degrades_to_exact_below_k(spark, tmp_path):
    # 10 buyers in 1995, 6 in 1996, 3 shared — all far below k=64, so
    # every sketch IS its set and every estimate must equal the exact
    import datetime

    rows = []
    oid = 0
    for ck in range(1, 11):  # A = {1..10}
        rows.append((oid, ck, datetime.datetime(1995, 3, 1))); oid += 1
    for ck in range(8, 14):  # B = {8..13}, overlap {8,9,10}
        rows.append((oid, ck, datetime.datetime(1996, 3, 1))); oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    sf = _write(spark, tmp_path, "orders", orders)
    r = QUERIES["agg_kmv_set_sketch"](spark, sf).collect()[0]
    assert (r["exact_a"], r["exact_b"]) == (10, 6)
    assert (r["exact_union"], r["exact_intersect"]) == (13, 3)
    assert r["est_a"] == pytest.approx(10.0, abs=1e-4)
    assert r["est_b"] == pytest.approx(6.0, abs=1e-4)
    assert r["est_union"] == pytest.approx(13.0, abs=1e-4)
    assert r["est_intersect"] == pytest.approx(3.0, abs=1e-4)


def test_kmv_estimates_within_sketch_error(spark):
    # k=64 -> relative standard error ~ 1/sqrt(64) = 12.5%; allow 4 sigma
    r = QUERIES["agg_kmv_set_sketch"](spark, SF_SMOKE).collect()[0]
    for exact, est in (
        (r["exact_a"], r["est_a"]),
        (r["exact_b"], r["est_b"]),
        (r["exact_union"], r["est_union"]),
    ):
        assert abs(est - exact) <= max(4, 0.5 * exact)


# --------------------------------------------------------------------------
# agg_bloom_filter_report
# --------------------------------------------------------------------------


def test_bloom_zero_false_negatives_planted(spark, tmp_path):
    # members {1..5}; probes {1..10}: Bloom FN=0 is structural, so
    # positives among members == 5 exactly -> n_positive - n_fp == 5
    import datetime

    orders = spark.createDataFrame(
        [(i, i, datetime.datetime(1995, 6, 1)) for i in range(1, 6)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    cust = spark.createDataFrame(
        [(i,) for i in range(1, 11)], "c_custkey long"
    )
    sf_dir = str(tmp_path / "sf")
    orders.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/orders.parquet")
    cust.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/customer.parquet")
    r = QUERIES["agg_bloom_filter_report"](spark, sf_dir).collect()[0]
    assert r["n_members"] == 5 and r["n_tested"] == 10
    assert r["n_positive"] - r["n_false_positive"] == 5
    assert r["n_bits_set"] <= 15  # <= k * members


def test_bloom_fpr_sane_at_smoke(spark):
    r = QUERIES["agg_bloom_filter_report"](spark, SF_SMOKE).collect()[0]
    assert r["n_positive"] - r["n_false_positive"] >= 0
    # m=8192 bits vs a few hundred members: measured FPR stays tiny
    assert r["fpr_measured"] is None or r["fpr_measured"] < 0.25


# --------------------------------------------------------------------------
# sim_mmr_rerank
# --------------------------------------------------------------------------


def test_mmr_planted_geometry(spark, tmp_path):
    # query 0 = e1; candidates with hand-computable cosines:
    #   10=[1,0]: rel 1.0      11=[.8,.6]: rel .8, sim(11,10)=.8
    #   12=[.6,-.8]: rel .6, sim(12,10)=.6, sim(12,11)=0
    #   13=[0,1]: rel 0, sim(13,11)=.6, sim(13,12)=-.8
    # greedy (lambda=.7): 10 (.7), 11 (.56-.24=.32),
    #   12 (.42-.18=.24), 13 (0-.3*.6=-.18)
    vecs = [
        (0, [1.0, 0.0, 0.0], 0),
        (10, [1.0, 0.0, 0.0], 0),
        (11, [0.8, 0.6, 0.0], 0),
        (12, [0.6, -0.8, 0.0], 0),
        (13, [0.0, 1.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int"
    )
    sf = _write(spark, tmp_path, "embeddings", emb)
    rows = QUERIES["sim_mmr_rerank"](spark, sf).collect()
    got = [(r["rnk"], r["neighbor_id"], r["mmr_score"]) for r in rows
           if r["query_id"] == 0]
    assert [g[1] for g in got] == [10, 11, 12, 13]
    for (rnk, _n, score), want in zip(got, (0.7, 0.32, 0.24, -0.18)):
        assert score == pytest.approx(want, abs=1e-6), rnk


# --------------------------------------------------------------------------
# win_skyline_pareto_2d
# --------------------------------------------------------------------------


def test_skyline_planted_front(spark, tmp_path):
    # (price, size): front = (1,5) and (2,9); (2,5) dominated by (1,5),
    # (3,9) dominated by (2,9), (1,5)-duplicate ties both survive
    parts = spark.createDataFrame(
        [
            (1, 1.0, 5),
            (2, 1.0, 5),   # exact duplicate objective: both on the front
            (3, 2.0, 5),   # dominated by (1.0, 5): same size, pricier
            (4, 2.0, 9),
            (5, 3.0, 9),   # dominated by (2.0, 9)
            (6, 2.5, 7),   # dominated by (2.0, 9)
        ],
        "p_partkey long, p_retailprice double, p_size int",
    )
    sf = _write(spark, tmp_path, "part", parts)
    got = sorted(
        (r["p_partkey"], r["price"], r["size"])
        for r in QUERIES["win_skyline_pareto_2d"](spark, sf).collect()
    )
    assert got == [(1, 1.0, 5), (2, 1.0, 5), (4, 2.0, 9)]


def test_skyline_matches_bruteforce_at_smoke(spark):
    rows = QUERIES["win_skyline_pareto_2d"](spark, SF_SMOKE).collect()
    from engine.session import T

    all_parts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in T(spark, SF_SMOKE, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in all_parts
        )

    want = sorted((k, pr, sz) for (k, pr, sz) in all_parts
                  if not dominated((k, pr, sz)))
    got = sorted((r["p_partkey"], r["price"], r["size"]) for r in rows)
    assert got == want


# --------------------------------------------------------------------------
# text_keyword_rake
# --------------------------------------------------------------------------


def test_rake_planted_scores(spark, tmp_path):
    # doc: "x y the x" -> phrases: "x y" (len 2), "x" (len 1)
    # word x: freq 2, degree 2+1=3 -> score 1.5; y: freq 1, degree 2 -> 2.0
    # phrase "x y" score 3.5; phrase "x" score 1.5
    docs = spark.createDataFrame(
        [(1, "x y the x", "en", "sA", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    got = {r["phrase"]: (r["n_occurrences"], r["rake_score"])
           for r in QUERIES["text_keyword_rake"](spark, sf).collect()}
    assert got["x y"] == (1, pytest.approx(3.5, abs=1e-6))
    assert got["x"] == (1, pytest.approx(1.5, abs=1e-6))


def test_rake_phrase_order_preserved(spark, tmp_path):
    # token order inside a phrase must follow document positions even
    # after shuffles (sort_array over (pos, tok) structs)
    docs = spark.createDataFrame(
        [(1, "zz aa qq the zz aa qq", "en", "sA", 21)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    phrases = [r["phrase"] for r in QUERIES["text_keyword_rake"](spark, sf).collect()]
    assert phrases == ["zz aa qq"]


# --------------------------------------------------------------------------
# sim_simhash_radius
# --------------------------------------------------------------------------


def test_simhash_radius_matches_bruteforce(spark):
    # pigeonhole banding must recover EXACTLY the popcount<=3 pairs —
    # band recall at r=3 with 4 bands is structural, not probabilistic
    from engine.session import T, parallelize_scan, scan_units
    from engine.similarity import simhash_df

    sh = {
        r["doc_id"]: r["simhash"]
        for r in simhash_df(
            parallelize_scan(
                T(spark, SF_SMOKE, "documents"), scan_units(SF_SMOKE, "documents")
            )
        )
        .select("doc_id", "simhash")
        .collect()
    }
    want = sorted(
        (q, d, bin(sh[q] ^ sh[d]).count("1"))
        for q in sh if q < 5
        for d in sh
        if d != q and bin(sh[q] ^ sh[d]).count("1") <= 3
    )
    got = sorted(
        (r["query_doc_id"], r["doc_id"], r["hamming"])
        for r in QUERIES["sim_simhash_radius"](spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0


# --------------------------------------------------------------------------
# graph_clustering_coefficient
# --------------------------------------------------------------------------


def test_clustering_coefficient_planted_triangle_vs_cycle(spark, tmp_path):
    # 'view' cohort ring over users 1,2,3 -> K3 (cc = 1.0 each);
    # 'click' cohort ring over users 4,5,6,7 -> C4 (cc = 0.0 each)
    day = 86_400_000_000 * 20_000
    rows, eid = [], 0
    for pos, user in enumerate([1, 2, 3]):
        for k in range(3):
            rows.append((eid, day + pos * 1_000_000 + k, user, "view", 1.0))
            eid += 1
    for pos, user in enumerate([4, 5, 6, 7]):
        for k in range(3):
            rows.append((eid, day + pos * 1_000_000 + k, user, "click", 1.0))
            eid += 1
    sf = _write(spark, tmp_path, "events", _events_df(spark, rows))
    got = {r["user_id"]: r
           for r in QUERIES["graph_clustering_coefficient"](spark, sf).collect()}
    for u in (1, 2, 3):
        assert (got[u]["degree"], got[u]["triangles"]) == (2, 1)
        assert got[u]["clustering"] == pytest.approx(1.0)
    for u in (4, 5, 6, 7):
        assert (got[u]["degree"], got[u]["triangles"]) == (2, 0)
        assert got[u]["clustering"] == pytest.approx(0.0)


# --------------------------------------------------------------------------
# win_drawdown_max
# --------------------------------------------------------------------------


def test_drawdown_planted(spark, tmp_path):
    # cum = [5, 2, -2, 8]; running max = [5,5,5,8]; draw = [0,3,7,0]
    vals = [5.0, -3.0, -4.0, 10.0]
    rows = [(i, i * 1_000_000, 7, "view", v) for i, v in enumerate(vals)]
    sf = _write(spark, tmp_path, "events", _events_df(spark, rows))
    r = QUERIES["win_drawdown_max"](spark, sf).collect()[0]
    assert r["max_drawdown"] == pytest.approx(7.0)


# --------------------------------------------------------------------------
# ts_burstiness_fano
# --------------------------------------------------------------------------


def test_fano_planted(spark, tmp_path):
    # hour A: 1 event, hour B: 5 events -> mean 3, sample var 8, fano 8/3
    hour_us = 3_600_000_000
    rows = [(0, 0, 7, "view", 1.0)]
    rows += [(i, hour_us + i, 7, "view", 1.0) for i in range(1, 6)]
    sf = _write(spark, tmp_path, "events", _events_df(spark, rows))
    r = QUERIES["ts_burstiness_fano"](spark, sf).collect()[0]
    assert r["n_hours"] == 2
    assert r["mean_per_hour"] == pytest.approx(3.0)
    assert r["fano_factor"] == pytest.approx(8.0 / 3.0, abs=1e-6)


# --------------------------------------------------------------------------
# agg_bootstrap_mean_ci
# --------------------------------------------------------------------------


def test_bootstrap_se_tracks_analytic_se(spark):
    # Poisson-bootstrap SE must approximate sd/sqrt(n); with B=16
    # replicates allow a generous factor-2 band around the analytic SE
    rows = {r["l_returnflag"]: r
            for r in QUERIES["agg_bootstrap_mean_ci"](spark, SF_SMOKE).collect()}
    from engine.session import T

    stats = {
        r["l_returnflag"]: r
        for r in T(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.stddev_samp("l_extendedprice").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert rows
    for flag, r in rows.items():
        analytic = stats[flag]["sd"] / stats[flag]["n"] ** 0.5
        assert r["boot_se"] > 0
        assert 0.5 * analytic < r["boot_se"] < 2.0 * analytic, flag
        assert r["ci_lo"] < r["sample_mean"] < r["ci_hi"], flag


# --------------------------------------------------------------------------
# scan_profile_columns
# --------------------------------------------------------------------------


def test_profile_planted_stats(spark, tmp_path):
    import datetime

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 1.5, datetime.datetime(1995, 1, 2), "1-URGENT"),
            (2, 10, "F", 2.5, datetime.datetime(1995, 1, 2), None),
            (3, 20, "O", 1.5, datetime.datetime(1996, 3, 4), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = _write(spark, tmp_path, "orders", orders)
    got = {r["column_name"]: r
           for r in QUERIES["scan_profile_columns"](spark, sf).collect()}
    assert set(got) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    }
    k = got["o_custkey"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (3, 0, 2)
    assert (k["top_value"], k["top_share"]) == ("10", pytest.approx(2 / 3, abs=1e-6))
    p = got["o_orderpriority"]
    assert (p["n_null"], p["n_distinct"]) == (1, 1)
    assert p["top_value"] == "1-URGENT"
    t = got["o_totalprice"]
    assert t["top_value"] == "150"  # canonical cents, not a float repr
    d = got["o_orderdate"]
    assert d["top_value"] == "1995-01-02"  # canonical ISO date
    # unique key: deterministic tie-break on the value string
    assert got["o_orderkey"]["top_value"] == "1"


# --------------------------------------------------------------------------
# plan gates + properties
# --------------------------------------------------------------------------


def test_kmv_bottom_k_plans_as_take_ordered(spark):
    # ORDER BY h LIMIT k must be per-partition bottom-k + merge,
    # never a global sort of the distinct-hash relation
    assert "TakeOrderedAndProject" in _plan(spark, "agg_kmv_set_sketch")


def test_rake_top20_plans_as_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "text_keyword_rake")


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),  # price in cents
            st.integers(min_value=1, max_value=12),   # size
        ),
        min_size=1,
        max_size=15,
    )
)
def test_prop_skyline_equals_bruteforce(spark, tmp_path_factory, pts):
    """Property: the 2-phase bucketed skyline equals the O(n²)
    dominance definition on ANY point set (duplicates included)."""
    parts = spark.createDataFrame(
        [(i, p / 100.0, s) for i, (p, s) in enumerate(pts)],
        "p_partkey long, p_retailprice double, p_size int",
    )
    sf_dir = str(tmp_path_factory.mktemp("sky") / "sf")
    parts.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/part.parquet")
    rows = QUERIES["win_skyline_pareto_2d"](spark, sf_dir).collect()
    got = sorted((r["p_partkey"], r["price"], r["size"]) for r in rows)
    pool = [(i, p / 100.0, s) for i, (p, s) in enumerate(pts)]
    want = sorted(
        (k, pr, sz)
        for (k, pr, sz) in pool
        if not any(
            q[1] <= pr and q[2] >= sz and (q[1] < pr or q[2] > sz) for q in pool
        )
    )
    assert got == want


# --------------------------------------------------------------------------
# scan_manifest_snapshot
# --------------------------------------------------------------------------


def test_manifest_snapshot_excludes_removed_file(spark):
    # live set is {part-0, part-2, part-3} = orders with o_orderkey%4 != 1;
    # a leak of removed part-1 (or a miss of any live slice) shifts counts
    from engine.session import T

    got = {r["o_orderstatus"]: (r["n_orders"], r["total_cents"])
           for r in QUERIES["scan_manifest_snapshot"](spark, SF_SMOKE).collect()}
    want = {
        r["o_orderstatus"]: (r["n"], r["cents"])
        for r in T(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderkey") % 4 != 1)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_manifest_time_travel_reads_v1_snapshot(spark):
    # as-of v1: live = {part-0, part-2} = o_orderkey % 4 in (0, 2)
    from engine.session import T

    got = {r["o_orderstatus"]: (r["n_orders"], r["total_cents"])
           for r in QUERIES["scan_manifest_time_travel"](spark, SF_SMOKE).collect()}
    want = {
        r["o_orderstatus"]: (r["n"], r["cents"])
        for r in T(spark, SF_SMOKE, "orders")
        .filter((F.col("o_orderkey") % 4).isin(0, 2))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want
