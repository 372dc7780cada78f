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
#: the enumeration order. ROUND-10 ROTATION (r9 delivered 50/50 green and
#: closed external certification: all 373 keys sampled, every latest word
#: green — so r10 is the first STALENESS-FIRST window, VERDICT r9 task 1):
#: (a) positions 1-6 — changed-code-first (the r5/r7/r8/r9 precedent):
#:     text_bpe_train (BRAND-NEW late-r10 iterative BPE induction;
#:     join_right moved behind the cutoff to keep the window at 50),
#:     stream_dedup_cascade (BRAND-NEW streaming twin of the dedup
#:     cascade — foreachBatch + versioned state stores, swapped in late
#:     exactly like the r9 Table S twins; wiki_rank_reduce moved to the
#:     tail to keep the window at 50),
#:     sim_cosine_topk_ivf_pq (BRAND-NEW Table T composite),
#:     sim_cosine_topk_lsh (r10 adaptive-width/multi-probe/split rewrite),
#:     sim_cosine_topk_pq + sim_cosine_topk_ivf (shared-helper refactor
#:     donors — prove the extraction changed nothing under the driver).
#: (b) positions 7-47 — the 41 remaining keys whose last external green
#:     is OLDEST (driver-sampled only in r1, eight rounds and several
#:     shared-infra changes ago: the relational core joins/windows/aggs/
#:     sets/sorts, filter/project, scan_json_lines/scan_project,
#:     topk_global).
#: (c) positions 48-50 — the three r2-stale keys riding the most
#:     environment-sensitive shared paths: tu_grouped_typed (pandas_udf),
#:     udaf_pandas_grouped + udf_arrow_scalar (Arrow batch transfer).
#: A fully-green r10 drops the window's median last-green age from ~8
#: rounds to current. FAIL-first stays the standing rule if any row
#: comes back red. Positions 51+ keep the prior priority order (minus
#: keys promoted above) so enumeration stays deterministic; keys not
#: listed keep registration order behind the prefix (guarded by
#: tests/test_oracle.py every pytest run).
_PRIORITY = (
    # -- (a) changed-code-first
    "text_bpe_train",  # BRAND-NEW (late r10): iterative BPE merge induction;
    # join_right moved below the cutoff to keep the window at 50 (its
    # one-line outer-join path is represented by join_left + join_full).
    "stream_dedup_cascade",
    "sim_cosine_topk_ivf_pq",
    "sim_cosine_topk_lsh",
    "sim_cosine_topk_pq",
    "sim_cosine_topk_ivf",
    # -- (b) the 41 remaining r1-stale keys (alphabetical; join_right
    #        displaced behind the cutoff by the text_bpe_train swap)
    "agg_cube",
    "agg_distinct",
    "agg_global",
    "agg_grouping_sets",
    "agg_having",
    "agg_median_mode",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "filter_in_like_null",
    "filter_simple",
    "join_anti",
    "join_asof",
    "join_broadcast",
    "join_bucketed_colocated",
    "join_cross",
    "join_full",
    "join_inner_equi",
    "join_left",
    "join_range_interval",
    "join_salted_skew",
    "join_semi",
    "join_star_5way",
    "join_theta_range",
    "project_arith",
    "project_conditional",
    "scan_json_lines",
    "scan_project",
    "set_except",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sort_multi_nulls",
    "topk_global",
    "win_first_last",
    "win_lead_lag",
    "win_ntile_pctrank",
    "win_range_frame",
    "win_rank_dense_rownum",
    "win_running_sum",
    "win_topk_per_group",
    # -- (c) r2-stale high-risk shared paths
    "tu_grouped_typed",
    "udaf_pandas_grouped",
    "udf_arrow_scalar",
    # ---- window cutoff (50) ----
    "join_right",
    "wiki_rank_reduce",
    # prior priority order (r9 window + earlier), minus promotions:
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
    "stream_stateful_count",
    "stream_stateful_tws",
    "stream_stateful_session_timeout",
    "graph_ktruss_peel",
    "pipeline_embed_batch",
    "agg_groupby_q1",
    "graph_triangles_banded",
    "graph_ktruss_banded",
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
