"""Planted-fixture and plan-shape tests for the Table J ops
(engine/tablej.py): priority sampling, frequent pairs, compaction
planning. The oracle pre-flight proves Spark ≡ DuckDB; these prove the
shared semantics are the INTENDED ones and the plans keep their 100 TB
shape."""

from __future__ import annotations

import hashlib
import io
import math
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from engine.registry import all_queries
from engine.tablej import _PRIORITY_K, compaction_bins, frequent_pairs

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


# --------------------------------------------------------------------------
# sample_weighted_priority
# --------------------------------------------------------------------------


def _py_priority(doc_id: int, weight: int) -> float:
    """The portable priority recomputed independently in Python."""
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    q = weight / ((h + 1) / float(1 << 60))
    return math.floor(q * 1e4 + 0.5) / 1e4 if q >= 0 else None


def test_priority_sample_matches_bruteforce(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "web", 10 + 37 * (i % 13)) for i in range(200)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    got = [
        (r["doc_id"], r["weight"], r["priority"])
        for r in QUERIES["sample_weighted_priority"](spark, sf).collect()
    ]
    exp = sorted(
        ((i, 10 + 37 * (i % 13)) for i in range(200)),
        key=lambda t: (-_py_priority(*t), t[0]),
    )[:_PRIORITY_K]
    assert [(d, w) for d, w, _ in got] == exp
    for d, w, p in got:
        assert p == _py_priority(d, w)


def test_priority_sample_is_weight_sensitive(spark, tmp_path):
    # one row with overwhelming weight must always be sampled
    docs = spark.createDataFrame(
        [(i, "t", "en", "web", 1) for i in range(100)]
        + [(999, "t", "en", "web", 10**9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    ids = {
        r["doc_id"]
        for r in QUERIES["sample_weighted_priority"](spark, sf).collect()
    }
    assert 999 in ids and len(ids) == _PRIORITY_K


def test_priority_sample_plan_is_topk(spark):
    # global top-k must plan as TakeOrderedAndProject (per-partition
    # heaps + driver merge), never a global sort
    assert "TakeOrderedAndProject" in _plan(spark, "sample_weighted_priority")


# --------------------------------------------------------------------------
# agg_frequent_pairs
# --------------------------------------------------------------------------


def test_frequent_pairs_planted_counts(spark):
    # 4 baskets: {a,b,c}, {a,b}, {a,c}, {b} → ab=2, ac=2, bc=1
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"), (2, "b"),  # dup collapses
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    b = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        (r["type_a"], r["type_b"]): (r["pair_users"], r["support"], r["lift"])
        for r in frequent_pairs(b, min_count=1).collect()
    }
    # n_users=4; marginals a=3, b=3, c=2
    assert got[("a", "b")][0] == 2 and got[("a", "c")][0] == 2
    assert got[("b", "c")][0] == 1
    assert got[("a", "b")][1] == 0.5  # support 2/4
    assert got[("a", "b")][2] == math.floor(2 * 4 / (3 * 3) * 1e4 + 0.5) / 1e4
    assert got[("a", "c")][2] == math.floor(2 * 4 / (3 * 2) * 1e4 + 0.5) / 1e4


def test_frequent_pairs_threshold_filters(spark):
    b = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
        "user_id long, event_type string",
    )
    got = {
        (r["type_a"], r["type_b"])
        for r in frequent_pairs(b, min_count=2).collect()
    }
    assert got == {("a", "b")}


def test_frequent_pairs_no_cartesian(spark):
    assert "CartesianProduct" not in _plan(spark, "agg_frequent_pairs")


# --------------------------------------------------------------------------
# scan_compaction_plan
# --------------------------------------------------------------------------


def test_compaction_bins_planted(spark):
    # target 100: files of 60,60,60 → cum_before 0,60,120 → bins 0,0,1
    # (greedy overshoot: bin 0 holds 120 bytes); singleton partition p2
    files = spark.createDataFrame(
        [("p1", 0, 60), ("p1", 1, 60), ("p1", 2, 60), ("p2", 0, 10)],
        "part string, file_id long, bytes long",
    )
    got = [
        (r["part"], r["bin"], r["n_files"], r["total_bytes"])
        for r in compaction_bins(files, 100).collect()
    ]
    assert got == [("p1", 0, 2, 120), ("p1", 1, 1, 60), ("p2", 0, 1, 10)]


def test_compaction_bins_respect_partition_boundaries(spark):
    # bytes never pack across partitions even when both are tiny
    files = spark.createDataFrame(
        [("a", 0, 1), ("b", 0, 1)], "part string, file_id long, bytes long"
    )
    got = {(r["part"], r["bin"]) for r in compaction_bins(files, 1000).collect()}
    assert got == {("a", 0), ("b", 0)}


def test_compaction_plan_covers_all_files(spark):
    # bin totals must re-add to the files relation total (no file lost)
    df = QUERIES["scan_compaction_plan"](spark, SF_SMOKE)
    total = df.agg(F.sum("total_bytes")).first()[0]
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    assert total == li.count() * 128


# --------------------------------------------------------------------------
# determinism audit (the Table I contract): double-run byte-identical
# --------------------------------------------------------------------------


_TABLEJ_KEYS = (
    "sample_weighted_priority",
    "agg_frequent_pairs",
    "scan_compaction_plan",
    "graph_label_propagation",
    "graph_sssp_bellman_ford",
    "join_interval_overlap",
    "text_zipf_fit",
    "graph_modularity_lp",
    "ts_seasonal_decompose",
    "text_ngram_novelty",
    "pipeline_dedup_cascade_report",
    "sim_centroid_drift",
    "ts_forecast_snaive",
    "win_hll_sliding_distinct",
    "agg_join_size_estimate",
)


def test_tablej_double_run_identical(spark):
    for key in _TABLEJ_KEYS:
        a = QUERIES[key](spark, SF_SMOKE).collect()
        b = QUERIES[key](spark, SF_SMOKE).collect()
        assert a == b, key


def test_tablej_partition_count_invariant(spark):
    # a result that changes with spark.sql.shuffle.partitions would let
    # driver-side config drift flip a value hash — run every Table J key
    # at 8 and 32 shuffle partitions and require byte-identical output
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        at8 = {k: QUERIES[k](spark, SF_SMOKE).collect() for k in _TABLEJ_KEYS}
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        for k in _TABLEJ_KEYS:
            assert QUERIES[k](spark, SF_SMOKE).collect() == at8[k], k
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


# --------------------------------------------------------------------------
# graph_label_propagation / graph_sssp_bellman_ford
# --------------------------------------------------------------------------


def _und(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    return (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


def test_label_propagation_two_cliques(spark):
    from engine.tablej import _lp_distributed, _lp_driver

    # two disjoint triangles; each converges to the all-min label
    und = _und(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)])
    got = sorted(map(tuple, _lp_driver(spark, und).collect()))
    assert got == [(1, 3), (4, 3)]
    assert got == sorted(map(tuple, _lp_distributed(und).collect()))


def test_label_propagation_tiebreak_is_min_label(spark):
    from engine.tablej import _lp_driver

    # star center 5 with leaves 1..4: center sees 4 distinct labels all
    # count 1 -> min label wins deterministically every round
    und = _und(spark, [(5, 1), (5, 2), (5, 3), (5, 4)])
    rows = dict(
        (r["label"], r["size"]) for r in _lp_driver(spark, und).collect()
    )
    # after 3 rounds: leaves oscillate with the center's label; the
    # histogram is deterministic regardless
    assert sum(rows.values()) == 5


def test_bellman_ford_prefers_cheap_two_hop(spark):
    from engine.tablej import _bf_driver

    # seeds = 3 smallest srcs {1,2,3}; direct 1->9 costs 10 but
    # 1->4->9 costs 2+3=5; node 7 unreachable keeps absent
    w = spark.createDataFrame(
        [(1, 9, 10), (1, 4, 2), (4, 9, 3), (2, 5, 1), (3, 6, 1), (8, 7, 1)],
        "src long, dst long, wt long",
    )
    got = dict((r["v"], r["dist"]) for r in _bf_driver(spark, w).collect())
    assert got[9] == 5 and got[4] == 2 and got[5] == 1 and got[6] == 1
    assert 7 not in got and got[1] == 0 and got[2] == 0 and got[3] == 0


def test_bellman_ford_round_bound_cuts_long_paths(spark):
    from engine.tablej import _BF_ROUNDS, _bf_driver

    # a chain longer than the round budget: seeds {1,2,3}, so the
    # farthest reachable node is 3 + K hops; everything beyond is absent
    chain = [(i, i + 1, 1) for i in range(1, 12)]
    w = spark.createDataFrame(chain, "src long, dst long, wt long")
    got = dict((r["v"], r["dist"]) for r in _bf_driver(spark, w).collect())
    for v in got:
        assert got[v] == max(0, v - 3)  # nearest seed is 3 for v > 3
    assert max(got) == 3 + _BF_ROUNDS
    assert 4 + _BF_ROUNDS not in got


def test_graph_paths_agree_on_real_graph(spark):
    from engine.analytics import materialize_affinity_edges
    from engine.tablej import (
        _bf_distributed,
        _bf_driver,
        _lp_distributed,
        _lp_driver,
    )

    edges = materialize_affinity_edges(spark, SF_SMOKE)
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    assert sorted(map(tuple, _lp_driver(spark, und).collect())) == sorted(
        map(tuple, _lp_distributed(und).collect())
    )
    w = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("wt")).cache()
    assert sorted(map(tuple, _bf_driver(spark, w).collect())) == sorted(
        map(tuple, _bf_distributed(w).collect())
    )


# --------------------------------------------------------------------------
# join_interval_overlap / text_zipf_fit
# --------------------------------------------------------------------------


def test_interval_overlap_planted(spark):
    import datetime as dt

    from engine.tablej import interval_overlap_pairs

    d = dt.date(2024, 1, 1)
    # u1 [100, 7300] spans 3 hour-cells; u2 [7000, 9000] overlaps 300s;
    # u3 [20000, 21000] disjoint; u4 same span as u1 but next day
    iv = spark.createDataFrame(
        [
            (1, d, 100, 7300),
            (2, d, 7000, 9000),
            (3, d, 20000, 21000),
            (4, dt.date(2024, 1, 2), 100, 7300),
        ],
        "user_id long, day date, s long, e2 long",
    )
    got = [
        (r["user_a"], r["user_b"], r["overlap_s"])
        for r in interval_overlap_pairs(iv, grid_s=3600).collect()
    ]
    assert got == [(1, 2, 300)]


def test_interval_overlap_dedups_multicell_pairs(spark):
    import datetime as dt

    from engine.tablej import interval_overlap_pairs

    # both intervals cover 5 shared hour-cells -> still ONE pair row
    d = dt.date(2024, 1, 1)
    iv = spark.createDataFrame(
        [(1, d, 0, 18000), (2, d, 0, 18000)],
        "user_id long, day date, s long, e2 long",
    )
    rows = interval_overlap_pairs(iv, grid_s=3600).collect()
    assert len(rows) == 1 and rows[0]["overlap_s"] == 18000


def test_interval_overlap_touching_endpoints_count(spark):
    import datetime as dt

    from engine.tablej import interval_overlap_pairs

    # closed-interval semantics: e2 == s touches -> overlap_s == 0
    d = dt.date(2024, 1, 1)
    iv = spark.createDataFrame(
        [(1, d, 0, 100), (2, d, 100, 200)],
        "user_id long, day date, s long, e2 long",
    )
    rows = interval_overlap_pairs(iv, grid_s=3600).collect()
    assert len(rows) == 1 and rows[0]["overlap_s"] == 0


def test_zipf_fit_on_exact_zipf_corpus(spark, tmp_path):
    # token t_k appears round(1000/k) times -> slope ~= -1, r2 ~= 1
    words = []
    for k in range(1, 21):
        words += [f"tok{k:02d}"] * round(1000 / k)
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "web", len(words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    r = QUERIES["text_zipf_fit"](spark, sf).first()
    assert r["n_terms"] == 20
    assert abs(r["slope"] + 1.0) < 0.01
    assert r["r2"] > 0.999


# --------------------------------------------------------------------------
# graph_modularity_lp / ts_seasonal_decompose / text_ngram_novelty
# --------------------------------------------------------------------------


def test_modularity_two_cliques_is_half(spark):
    # two disjoint triangles, LPA labels them perfectly -> for two equal
    # modules with no inter-edges: Q = 1 - 2*(1/2)^2 = 0.5
    from engine.tablej import _lp_labels_driver

    und = _und(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)])
    labels = _lp_labels_driver(spark, und)
    # recompute Q by hand on the planted graph
    two_m = und.count()  # 12 directed half-edges -> m = 6
    assert two_m == 12
    lab = dict((r["v"], r["label"]) for r in labels.collect())
    assert len(set(lab.values())) == 2
    # every edge is within-community -> W = 12; each community d_c = 6
    # Q = (2m*W - sum d_c^2)/(2m)^2 = (12*12 - 72)/144 = 0.5
    got = QUERIES["graph_modularity_lp"]
    # planted check of the formula itself (key runs on the real graph)
    q = (two_m * 12 - (6 * 6 + 6 * 6)) / (two_m * two_m)
    assert q == 0.5


def test_modularity_key_bounds_and_consistency(spark):
    r = QUERIES["graph_modularity_lp"](spark, SF_SMOKE).first()
    # modularity is bounded in [-0.5, 1]; communities partition nodes
    assert -0.5 <= r["q_modularity"] <= 1.0
    assert r["n_communities"] >= 1 and r["m_edges"] >= 1
    # same graph, same rounds as the histogram key: community count of
    # the FULL partition >= communities shown in the top-20 histogram
    hist = QUERIES["graph_label_propagation"](spark, SF_SMOKE).collect()
    assert r["n_communities"] >= len(hist)


def test_seasonal_decompose_recovers_planted_cycle(spark, tmp_path):
    import math as _math

    # 14 days of hourly counts: base 100 + spike of +24 at hod 12
    # (pure 24h seasonality, zero trend) -> seasonal ~= +23 at hod 12,
    # ~= -1 elsewhere (the spike shifts the mean by 1)
    rows = []
    eid = 0
    for day in range(14):
        for hod in range(24):
            n = 3 + (2 if hod == 12 else 0)
            for k in range(n):
                ts_us = ((day * 24 + hod) * 3600 + k * 60) * 1_000_000
                rows.append((eid, ts_us, 1, "view", 1.0))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_micros("ts_us").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    sf_dir = str(tmp_path / "sf")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    out = {
        r["hod"]: r["seasonal"]
        for r in QUERIES["ts_seasonal_decompose"](spark, sf_dir).collect()
    }
    assert len(out) == 24
    # hod 12 spikes well above every other hour's seasonal index
    assert out[12] == max(out.values()) and out[12] > 1.5
    assert abs(sum(out.values())) < 0.5  # indices roughly centered


def test_ngram_novelty_duplicate_doc_scores_zero(spark, tmp_path):
    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "one two three four five six seven"
    docs = spark.createDataFrame(
        [
            (1, text_a, "en", "web", len(text_a)),
            (2, text_b, "en", "web", len(text_b)),
            (3, text_a, "en", "web", len(text_a)),  # exact dup of doc 1
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    out = {
        r["doc_id"]: (r["n_novel"], r["novelty"])
        for r in QUERIES["text_ngram_novelty"](spark, sf).collect()
    }
    assert out[1][1] == 1.0 and out[2][1] == 1.0
    assert out[3] == (0, 0.0)  # every shingle first seen in doc 1


# --------------------------------------------------------------------------
# pipeline_dedup_cascade_report / sim_centroid_drift
# --------------------------------------------------------------------------


def test_dedup_cascade_planted_funnel(spark, tmp_path):
    # docs 1 and 2 byte-identical (exact dup), doc 3 a near-dup of 1
    # (one token changed in a long text), doc 4 unrelated
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(("CHANGED" if i == 37 else f"w{i}") for i in range(40))
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base, "en", "web", len(base)),
            (2, base, "en", "web", len(base)),
            (3, near, "en", "web", len(near)),
            (4, other, "en", "web", len(other)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    rows = {
        r["stage"]: (r["n_in"], r["n_removed"], r["n_out"])
        for r in QUERIES["pipeline_dedup_cascade_report"](spark, sf).collect()
    }
    assert rows["1_exact"] == (4, 1, 3)   # doc 2 removed (dup of 1)
    assert rows["2_near"] == (3, 1, 2)    # doc 3 removed (near-dup of 1)


def test_centroid_drift_identical_halves_cos_one(spark, tmp_path):
    # both halves of each label carry the SAME vector -> cosine == 1.0
    rows = [
        (i, [0.5, -0.25, 0.125, 0.0625] if i % 3 == 0 else [0.1, 0.2, 0.3, 0.4],
         i % 3)
        for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).select("vec_id", "embedding", "label")
    sf = _write(spark, tmp_path, "embeddings", emb)
    out = QUERIES["sim_centroid_drift"](spark, sf).collect()
    assert len(out) == 3
    for r in out:
        assert r["cosine"] == 1.0
        assert r["n_a"] + r["n_b"] == 20


def test_centroid_drift_orthogonal_halves_cos_zero(spark, tmp_path):
    # even vec_ids point along e1, odd along e2 -> centroids orthogonal
    rows = [
        (i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0], 0) for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = _write(spark, tmp_path, "embeddings", emb)
    r = QUERIES["sim_centroid_drift"](spark, sf).first()
    assert r["cosine"] == 0.0 and r["n_a"] == 20 and r["n_b"] == 20


# --- hypothesis property tests (SURVEY.md §5.2 layer 3) ---------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=1, max_size=80
    )
)
def test_prop_priority_sample_equals_bruteforce(spark, tmp_path_factory, weights):
    """Property: the distributed top-k priority sample equals the
    Python brute force under the SAME portable hash on ANY weight set."""
    from engine.tablej import _PRIORITY_K

    docs = spark.createDataFrame(
        [(i, "t", "en", "web", w) for i, w in enumerate(weights)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path_factory.mktemp("prio") / "sf")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["doc_id"], r["weight"])
        for r in QUERIES["sample_weighted_priority"](spark, sf_dir).collect()
    ]
    want = sorted(
        enumerate(weights), key=lambda t: (-_py_priority(*t), t[0])
    )[: _PRIORITY_K]
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=30
    ),
    target=st.integers(min_value=1, max_value=600),
)
def test_prop_compaction_bins_greedy_equivalent(spark, sizes, target):
    """Property: window-cumsum bin assignment equals the sequential
    greedy fold (bin increments when the running total crosses the
    target) on ANY file-size sequence, and conserves bytes."""
    files = spark.createDataFrame(
        [("p", i, s) for i, s in enumerate(sizes)],
        "part string, file_id long, bytes long",
    )
    got = [
        (r["bin"], r["n_files"], r["total_bytes"])
        for r in compaction_bins(files, target).orderBy("bin").collect()
    ]
    # sequential reference: bin = floor(bytes_before / target)
    import collections

    bins = collections.defaultdict(lambda: [0, 0])
    cum = 0
    for s in sizes:
        b = cum // target
        bins[b][0] += 1
        bins[b][1] += s
        cum += s
    want = [(b, n, t) for b, (n, t) in sorted(bins.items())]
    assert got == want
    assert sum(t for _, _, t in got) == sum(sizes)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_prop_bellman_ford_equals_khop_minplus(spark, edges):
    """Property: the driver relaxation equals the K-hop min-plus
    closure (shortest path using <= K relaxation rounds) on ANY small
    weighted digraph."""
    from engine.tablej import _BF_ROUNDS, _BF_SEEDS, _bf_driver

    # collapse parallel edges to min weight like groupBy count wouldn't:
    # feed the already-weighted relation (the key's w has one row per
    # (src, dst)); dedupe here keeping the min weight
    w = {}
    for s, d, wt in edges:
        if s != d:
            w[(s, d)] = min(wt, w.get((s, d), 10**9))
    if not w:
        return
    wdf = spark.createDataFrame(
        [(s, d, wt) for (s, d), wt in sorted(w.items())],
        "src long, dst long, wt long",
    )
    got = dict(
        (r["v"], r["dist"]) for r in _bf_driver(spark, wdf).collect()
    )
    seeds = sorted({s for s, _ in w})[:_BF_SEEDS]
    dist = {v: 0 for v in seeds}
    for _ in range(_BF_ROUNDS):
        nxt = dict(dist)
        for (s, d), wt in w.items():
            if s in dist and dist[s] + wt < nxt.get(d, 10**18):
                nxt[d] = dist[s] + wt
        dist = nxt
    assert got == dist


def test_tablej_topk_plans(spark):
    # every global top-k in Table J must plan as TakeOrderedAndProject
    # (per-partition heaps + k-row merge), never a full global sort
    for key in ("text_zipf_fit", "join_interval_overlap",
                "graph_label_propagation"):
        assert "TakeOrderedAndProject" in _plan(spark, key), key


def test_tablej_no_cartesian_products(spark):
    for key in _TABLEJ_KEYS:
        assert "CartesianProduct" not in _plan(spark, key), key


def test_snaive_perfect_weekly_cycle_scores_zero_mae(spark, tmp_path):
    # counts depend only on hour-of-week -> week-ago forecast is exact
    rows = []
    eid = 0
    for day in range(21):  # 3 weeks
        for hod in range(24):
            n = 1 + ((day % 7) * 24 + hod) % 5
            for k in range(n):
                ts_us = ((day * 24 + hod) * 3600 + k) * 1_000_000
                rows.append((eid, ts_us, 1, "view", 1.0))
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, value double",
    ).select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id",
        "event_type", "value", F.lit("{}").alias("props"),
    )
    sf_dir = str(tmp_path / "sf")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    r = QUERIES["ts_forecast_snaive"](spark, sf_dir).first()
    assert r["mae"] == 0.0 and r["bias"] == 0.0
    assert r["n_eval"] == 2 * 7 * 24  # weeks 2-3 score against week 1-2


def test_snaive_known_shift_scores_exact_bias(spark, tmp_path):
    # week 2 counts = week 1 counts + 2 every hour -> mae = bias = 2
    rows = []
    eid = 0
    for day in range(14):
        for hod in range(24):
            n = 3 + (2 if day >= 7 else 0)
            for k in range(n):
                ts_us = ((day * 24 + hod) * 3600 + k) * 1_000_000
                rows.append((eid, ts_us, 1, "view", 1.0))
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, value double",
    ).select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id",
        "event_type", "value", F.lit("{}").alias("props"),
    )
    sf_dir = str(tmp_path / "sf")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    r = QUERIES["ts_forecast_snaive"](spark, sf_dir).first()
    assert r["mae"] == 2.0 and r["bias"] == 2.0 and r["n_eval"] == 7 * 24


# --------------------------------------------------------------------------
# win_hll_sliding_distinct
# --------------------------------------------------------------------------


def _py_hll(users) -> float:
    """The estimator recomputed independently in Python from the same
    portable hash: register max-merge + scaled harmonic sum + linear
    counting correction."""
    M = [0] * 64
    for u in users:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        j, w = h % 64, h // 64
        rho = 55 if w == 0 else 55 - w.bit_length()
        M[j] = max(M[j], rho)
    s_scaled = sum(1 << (55 - m) for m in M)
    v = sum(1 for m in M if m == 0)
    raw = (0.709 * 4096.0 * float(2**55)) / s_scaled
    est = 64.0 * math.log(64.0 / v) if (raw <= 160.0 and v > 0) else raw
    return math.floor(est * 1e4 + 0.5) / 1e4


def test_hll_sliding_matches_python_reference(spark, tmp_path):
    # 3 hours of events; hour h sees users h*10 .. h*10+14 (overlap-free
    # windows at this scale: trailing 24h covers all previous hours)
    rows = []
    eid = 0
    for hh in range(3):
        for u in range(hh * 10, hh * 10 + 15):
            rows.append((eid, (hh * 3600 + u) * 1_000_000, u, "view", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, value double",
    ).select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id",
        "event_type", "value", F.lit("{}").alias("props"),
    )
    sf_dir = str(tmp_path / "sf")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    out = {
        r["hr"] % 24: (r["hll_est"], r["exact_distinct"])
        for r in QUERIES["win_hll_sliding_distinct"](spark, sf_dir).collect()
    }
    # hour 0 sees users 0-14; hour 1 adds 10-24 (union 0-24); hour 2 0-34
    assert out[0][1] == 15 and out[1][1] == 25 and out[2][1] == 35
    assert out[0][0] == _py_hll(range(0, 15))
    assert out[1][0] == _py_hll(range(0, 25))
    assert out[2][0] == _py_hll(range(0, 35))


def test_hll_sliding_accuracy_on_smoke(spark):
    rows = QUERIES["win_hll_sliding_distinct"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.5 * r["exact_distinct"] <= r["hll_est"] <= 2.0 * r["exact_distinct"]


# --------------------------------------------------------------------------
# agg_join_size_estimate
# --------------------------------------------------------------------------


def test_join_size_estimate_bound_and_exact(spark):
    r = QUERIES["agg_join_size_estimate"](spark, SF_SMOKE).first()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    # FK join: every lineitem matches exactly one order
    assert r["exact_join_rows"] == li.count()
    # AGMS/CM inner product is a one-sided overestimate...
    assert r["overcount"] >= 0
    # ...whose additive error concentrates around tot_a*tot_b/width:
    # min over 4 independent rows stays within a small factor of it
    assert r["overcount"] <= 4 * r["expected_noise"] + r["exact_join_rows"]
    assert r["est_join_rows"] == r["exact_join_rows"] + r["overcount"]
