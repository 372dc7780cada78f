"""Single source of truth for the driver contract.

Every query key from SURVEY.md §2 registers here via the ``@register``
decorator; ``__spark_entry__.py`` re-exports ``all_queries()`` /
``all_oracles()``. Keys registered without SQL would get the driver's
weaker rows-only check — since late round 7 there are NONE: every key
(including the true-streaming watermark/timer keys, via artifact-pinned
micro-batch-replay SQL) carries a full DuckDB value oracle.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
#: oracle SQL per key — either the string itself or a ZERO-ARG callable
#: returning it. Callables resolve at all_oracles() CALL time, not at
#: decoration (import) time: oracle builders that embed artifact paths
#: fingerprinted on the source tables (streaming replay slices, the
#: pagerank ranks9 cache, ...) must see the fingerprint of the data as
#: it is when the driver runs, or a testdata regeneration inside a
#: long-lived process serves a stale path (ADVICE r7).
ORACLES: dict[str, str | Callable[[], str]] = {}

#: modules that register queries (imported lazily so a bug in one module
#: doesn't take down the whole contract surface while developing).
_MODULES = (
    "engine.supplier",
    "engine.functions_sql",
    "engine.udfs",
    "engine.orders_port",
    "engine.kmeans",
    "engine.summary",
    "engine.text",
    "engine.similarity",
    "engine.multimodal",
    "engine.streaming",
    "engine.relational",
    "engine.analytics",
    "engine.tableh",
    "engine.tablei",
    "engine.tablej",
    "engine.tablek",
    "engine.tablel",
    "engine.tablem",
    "engine.tablen",
    "engine.tableo",
    "engine.tablep",
    "engine.tableq",
    "engine.tabler",
)

#: ORDER MATTERS for driver verification: the driver's correctness sweep
#: checks a fixed-size PREFIX (exactly 50 keys every delivered round) of
#: the enumeration order. ROUND-9 ROTATION (r8 delivered 50/50 green;
#: cross-round coverage 330/371 with 41 keys never sampled; VERDICT r8
#: tasks 1/2 — finish external certification):
#: (a) positions 1-41 — the 41 never-sampled keys, promoted verbatim from
#:     r8's positions 51+ (promote-the-tail): the 25-key stats/text/graph
#:     tail, the 4 codec-path scan keys + agg_hll_mergeable, text_lm_score,
#:     the 4 remaining TPC-H ports (q8/q13/q15/q17), merge_upsert_scd2,
#:     and the 5 pipeline/quality keys. First-ever driver rows for all 41
#:     closes the registry at 371/371 externally certified.
#: (b) positions 42-50 — highest-risk RE-certifications (VERDICT r8 task
#:     2): the three stateful streaming keys (heaviest harness, most
#:     environment-sensitive), the two heaviest plans (PQ ANN, k-truss),
#:     pipeline_embed_batch (the r8 fix — prove it stays green),
#:     agg_groupby_q1 (the flagship), and — changed-code-first rule, the
#:     r5/r7/r8 precedent — the two BRAND-NEW Table S keys
#:     (graph_triangles_banded / graph_ktruss_banded, the banded cohort
#:     twins added late in r9): new code certifies first, and with them
#:     in the window a fully-green r9 closes certification of the ENTIRE
#:     373-key registry with zero never-sampled keys remaining.
#: Positions 51+ list r8's window keys (all green r8) so enumeration
#: stays deterministic; keys not listed are driver-green r1-r7 and keep
#: registration order behind the prefix (guarded by tests/test_oracle.py
#: every pytest run).
_PRIORITY = (
    # -- (a) the 41 never-sampled keys (r8 positions 51+, verbatim order)
    "ts_autocorr_lag1",
    "text_bigram_lm",
    "text_langid_confusion",
    "text_vocab_oov_rate",
    "text_char_entropy",
    "graph_degree_distribution",
    "graph_jaccard_link_prediction",
    "graph_assortativity",
    "graph_reciprocity",
    "agg_mann_whitney_u",
    "agg_seasonality_strength",
    "agg_ks_statistic",
    "agg_benford_first_digit",
    "agg_psi_drift",
    "agg_chi_square_independence",
    "agg_ab_test_welch",
    "agg_markov_transitions",
    "agg_join_key_skew_report",
    "agg_hist_equi_depth",
    "agg_hist_log_bins",
    "agg_quantile_multi",
    "agg_weighted_median",
    "agg_trimmed_mean",
    "agg_moments_skew_kurtosis",
    "agg_gini_concentration",
    "scan_binaryfile",
    "scan_text_lines",
    "scan_csv_gzip",
    "scan_orc_roundtrip",
    "agg_hll_mergeable",
    "text_lm_score",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "merge_upsert_scd2",
    "pipeline_quality_composite",
    "text_pii_mask",
    "pipeline_pack_sequences",
    "pipeline_dataset_card",
    "pipeline_chunk_overlap",
    # -- (b) positions 42-50: highest-risk re-certifications
    "stream_stateful_count",
    "stream_stateful_tws",
    "stream_stateful_session_timeout",
    "sim_cosine_topk_pq",
    "graph_ktruss_peel",
    "pipeline_embed_batch",
    "agg_groupby_q1",
    "graph_triangles_banded",
    "graph_ktruss_banded",
    # ---- window cutoff (50) ----
    # r8's window keys (all green r8), prior order, minus those promoted
    # into (b) above:
    "graph_adamic_adar_link_prediction",
    "scan_partition_evolution",
    "sample_balanced_downsample",
    "text_burrows_delta",
    "text_bpe_apply",
    "agg_survival_km",
    "join_fifo_lot_match",
    "win_time_decay_attribution",
    "agg_rfm_segmentation",
    "agg_markov_attribution",
    "agg_hdr_histogram_quantiles",
    "win_ewma_irregular",
    "pipeline_seeded_shuffle",
    "pipeline_dataset_diff",
    "scan_manifest_vacuum_plan",
    "stream_rate_micro_batch",
    "scan_delete_vectors_apply",
    "feat_standard_scale",
    "feat_quantile_bin",
    "feat_target_encode",
    "feat_hashing_trick",
    "join_fuzzy_blocked",
    "scan_python_datasource",
    "agg_incremental_rollup",
    "scan_expectations_report",
    "agg_spearman_rank",
    "sink_python_datasource",
    "scan_xml_roundtrip",
    "udf_cogroup_pandas",
    "win_session_window_native",
    "udtf_table_arg",
    "agg_theil_sen_slope",
    "graph_random_walk_deterministic",
    "win_allocation_waterfall",
    "sim_cosine_topk_ivf",
    "sim_ann_partitioned_probe",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_substring_spans",
    "dedup_lines_global",
    "pipeline_keep_best_dedup",
    "win_mad_outliers",
    "pipeline_bpe_pair_counts",
    "agg_entropy",
    "graph_pagerank",
    "graph_triangles",
    "pipeline_e2e_pretrain",
)

def _ordered(d: dict) -> dict:
    # Hard-fail on a _PRIORITY name absent from the dict (ADVICE r8):
    # a rename that skips CI, or a partial module-import failure, would
    # otherwise silently shrink the driver's 50-key window prefix.
    missing = [k for k in _PRIORITY if k not in d]
    if missing:
        raise KeyError(
            f"_PRIORITY names missing from registry ({len(missing)}): "
            f"{missing[:10]}"
        )
    head = {k: d[k] for k in _PRIORITY}
    return head | {k: v for k, v in d.items() if k not in head}

_loaded = False


def register(
    name: str, sql: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf: str) -> DataFrame:
            # free caches the PREVIOUS query left alive for its consumer
            # (queries run sequentially in the driver sweep; no query
            # calls another registered query, only unwrapped helpers)
            from engine.session import drain_scratch_caches

            drain_scratch_caches()
            return fn(spark, sf)

        QUERIES[name] = wrapped
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load()
    return _ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    # Callable builders re-execute on every call BY DESIGN (freshness:
    # fingerprinted artifact paths must track the data as it is when the
    # driver runs). ADVICE r8 reviewed this; memoize keyed on the
    # resolved fingerprint only if call frequency ever grows.
    _load()
    return _ordered({k: (v() if callable(v) else v) for k, v in ORACLES.items()})
