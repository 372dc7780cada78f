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
#: the enumeration order. ROUND-8 ROTATION (r7 delivered 49 green + 1 ERR
#: out of 50; 90 keys never sampled going in; VERDICT r7 tasks 1/3/5):
#: (a) position 1 — pipeline_embed_batch, the single red r7 row, whose
#:     output shape changed this round (FAIL-first rule);
#: (b) positions 2-37 — the five r7 late waves, newest code first:
#:     Table Q (5), Table R (5), Table M (8), Table N (5), Table O (13),
#:     all never sampled;
#: (c) positions 38-50 — the highest-impact never-sampled tail: the
#:     remaining approximate-ANN legs (IVF / partitioned-probe; PQ rides
#:     in Table M), the simhash/dedup block, the 4 Table G keys, and
#:     graph_pagerank / graph_triangles / pipeline_e2e_pretrain.
#: Positions 51+ enumerate the remaining 41 never-sampled keys verbatim
#: so the round-9 rotation is again a pure promote-the-tail that
#: finishes external certification of the whole registry. Keys not
#: listed are driver-green r1-r7 and keep registration order behind the
#: prefix (guarded by tests/test_oracle.py every pytest run).
_PRIORITY = (
    # -- (a) the one red r7 row, code changed this round (FAIL-first rule):
    #    emb now leaves the query comma-joined (scalar-column contract)
    "pipeline_embed_batch",
    # -- (b) newest code first: Table Q (r7 6th wave), never sampled
    "graph_adamic_adar_link_prediction",
    "scan_partition_evolution",
    "sample_balanced_downsample",
    "text_burrows_delta",
    "text_bpe_apply",
    # -- Table R (r7 7th wave), never sampled
    "agg_survival_km",
    "join_fifo_lot_match",
    "win_time_decay_attribution",
    "agg_rfm_segmentation",
    "agg_markov_attribution",
    # -- Table M (r7 2nd wave), never sampled
    "agg_hdr_histogram_quantiles",
    "win_ewma_irregular",
    "pipeline_seeded_shuffle",
    "pipeline_dataset_diff",
    "scan_manifest_vacuum_plan",
    "stream_rate_micro_batch",
    "sim_cosine_topk_pq",
    "scan_delete_vectors_apply",
    # -- Table N (r7 3rd wave), never sampled
    "feat_standard_scale",
    "feat_quantile_bin",
    "feat_target_encode",
    "feat_hashing_trick",
    "join_fuzzy_blocked",
    # -- Table O (r7 4th wave), never sampled
    "scan_python_datasource",
    "agg_incremental_rollup",
    "scan_expectations_report",
    "agg_spearman_rank",
    "graph_ktruss_peel",
    "sink_python_datasource",
    "scan_xml_roundtrip",
    "udf_cogroup_pandas",
    "win_session_window_native",
    "udtf_table_arg",
    "agg_theil_sen_slope",
    "graph_random_walk_deterministic",
    "win_allocation_waterfall",
    # -- (c) highest-impact never-sampled tail: the remaining approximate-
    #    ANN legs (VERDICT r7 task 5), the simhash/dedup block, the four
    #    Table G keys, and the two flagship graph keys
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
    # ---- window cutoff (50) ----
    # every remaining never-sampled key (41), prior enumeration order:
    # the round-9 window is positions 51+ verbatim (promote-the-tail)
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
)

def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
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
    _load()
    return _ordered({k: (v() if callable(v) else v) for k, v in ORACLES.items()})
