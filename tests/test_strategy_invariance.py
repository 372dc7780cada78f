"""Physical-strategy invariance: results must be IDENTICAL when the
optimizer is pushed onto different physical plans — AQE disabled and
broadcast joins forced off (everything degrades to shuffle joins).
This is the determinism axis the shuffle-partition audits don't cover:
a key whose values depend on which JOIN STRATEGY ran (e.g. a
nondeterministic tie silently resolved by broadcast build order) passes
double-run audits but breaks on a real cluster where AQE re-plans at
runtime. A representative key per family keeps the matrix affordable;
the per-table determinism audits cover the rest."""

from __future__ import annotations

from engine.registry import all_queries

from .conftest import SF_SMOKE

QUERIES = all_queries()

#: one representative per family/mechanism: broadcast-heavy joins,
#: window ranks, iterative graph loops, Python boundaries, artifact
#: writers, offset-merge ranks, and the new Table N/O surface
_KEYS = (
    "join_q5_local_supplier",      # 5-way star join (broadcast-heavy)
    "join_fuzzy_blocked",          # union of blocking joins + window
    "agg_groupby_q1",              # flagship partial agg
    "feat_standard_scale",         # broadcast stats join
    "feat_quantile_bin",           # width_bucket offset-merge rank
    "agg_spearman_rank",           # two rank builds + rank joins
    "agg_theil_sen_slope",         # distributed-selection medians
    "graph_ktruss_peel",           # iterative loop w/ localCheckpoint
    "udf_cogroup_pandas",          # cogrouped Python boundary
    "scan_expectations_report",    # anti join + stack
    "win_session_window_native",   # native session merge
    "scan_delete_vectors_apply",   # broadcast DV sidecar join
    "graph_adamic_adar_link_prediction",  # wedge self-join + anti join (Q)
    "graph_personalized_pagerank",  # unrolled integer join+agg rounds (P)
    "sim_rrf_fusion",              # dual-window rank fusion (P)
    "agg_survival_km",             # bounded-relation windows + driver count (R)
    "join_fifo_lot_match",         # cumulative-interval overlap join (R)
    "agg_rfm_segmentation",        # three offset-merge rank builds (R)
)

_FLAGS = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_results_invariant_to_join_strategy_and_aqe(spark):
    baseline = {k: QUERIES[k](spark, SF_SMOKE).collect() for k in _KEYS}
    prev = {f: spark.conf.get(f) for f in _FLAGS}
    try:
        for f, v in _FLAGS.items():
            spark.conf.set(f, v)
        for k in _KEYS:
            assert QUERIES[k](spark, SF_SMOKE).collect() == baseline[k], k
    finally:
        for f, v in prev.items():
            spark.conf.set(f, v)
