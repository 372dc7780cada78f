"""Single source of truth for the driver contract.

Every query key from SURVEY.md §2 registers here via the ``@register``
decorator; ``__spark_entry__.py`` re-exports ``all_queries()`` /
``all_oracles()``. Keys registered without SQL get the driver's weaker
rows-only check (non-SQL-expressible ops: LSH, k-means, true streaming).
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

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
)

#: ORDER MATTERS for driver verification: the driver's correctness sweep
#: checks a fixed-size PREFIX (~50 keys) of the enumeration order each
#: round. Instead of shuffling module import order (fragile — see
#: ADVICE r2), the keys that most need external confirmation are
#: enumerated FIRST, explicitly. Rotated for ROUND 4 (VERDICT r3 top
#: item: an unchanged order would re-verify exactly r3's 50 green keys
#: and confirm nothing new): (a) the 4 keys whose latest driver word is
#: FAIL/ERR (fixed r2/r3, never re-sampled); (b) the 6 keys whose SQL
#: oracles are NEW this round (approx sketches via exact-twin columns,
#: multimodal via generator-spec oracles); (c) r3's oracle upgrades the
#: driver has never run with SQL; (d) never-sampled SQL-oracled keys,
#: highest-complexity first; (e) the remaining rows-only keys.
#: Everything not listed keeps registration order behind the prefix
#: (driver-green r1-r3, still guarded by tests/test_oracle.py).
_PRIORITY = (
    # -- (a) driver's last word is FAIL (r2) / ERR (r1) — fixes in tree
    "fn_array_lambda",
    "pipeline_pretrain_filter",
    "agg_collect_sorted",
    "agg_approx_quantiles",
    # -- (b) SQL oracles new in r4, never driver-run (incl. the four
    #    Table G ops added mid-round — brand-new code verifies first)
    "agg_approx_distinct",
    "agg_hll_mergeable",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_audio_features",
    "multimodal_phash_dedup",
    "win_mad_outliers",
    "pipeline_keep_best_dedup",
    "pipeline_bpe_pair_counts",
    "agg_entropy",
    # -- (c) r3 oracle upgrades, never driver-run with SQL
    "scan_csv_roundtrip",
    "scan_orc_roundtrip",
    "sink_parquet_partitioned",
    "sample_per_group",
    "sample_stratified",
    "fn_map",
    "wiki_parse_lines",
    "text_fingerprint",
    "dedup_near_minhash",
    "so_kmeans",
    "sim_cosine_topk_ivf",
    "sim_ann_partitioned_probe",
    "dedup_clusters",
    "dedup_simhash",
    "stream_static_join",
    "stream_stateful_count",
    "stream_stream_join",
    # -- (d) never driver-sampled, SQL-oracled, highest complexity first
    "pipeline_e2e_pretrain",
    "graph_pagerank",
    "graph_triangles",
    "merge_upsert_scd2",
    "stream_foreachbatch_upsert",
    "stream_stateful_session_timeout",
    "stream_stateful_tws",
    "pipeline_pack_sequences",
    "pipeline_chunk_overlap",
    "pipeline_quality_composite",
    "pipeline_dataset_card",
    "dedup_substring_spans",
    "dedup_lines_global",
    "text_lm_score",
    "text_pii_mask",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "q22_sales_opportunity",
    "agg_corr_matrix",
    "agg_bitmap_distinct",
    "agg_count_distinct_multi",
    "agg_filter_clause",
    "agg_grouping_flags",
    "join_aqe_skew",
    "join_range_bucketed",
    "join_asof_nearest",
    "sub_lateral_topn",
    "sub_not_in_null_trap",
    "win_gaps_islands",
    "win_nth_value",
    "win_distinct_rolling",
    "ts_interpolate_linear",
    "ts_downsample_ohlc",
    "ts_ewma",
    "fn_map_lambda",
    "fn_url_parse",
    "fn_xml",
    "fn_regexp",
    "fn_posexplode",
    "set_intersect_all",
    "set_except_all",
    "scan_csv_malformed",
    "scan_wholetext_docs",
    "scan_observe_metrics",
    "sink_partition_overwrite_dynamic",
    "sample_split_train_eval",
    "udf_pandas_grouped_map",
    "udf_pandas_iter",
    "udf_map_in_arrow",
    # -- plans rewritten in r4 (green r2, worth a fresh driver row)
    "wiki_rank_index",
    "text_wordcount_topn",
    # -- (e) rows-only: estimator/streaming semantics, no SQL oracle
    "sim_cosine_topk_lsh",
    "stream_watermark_late",
    "stream_dedup_watermark",
    "so_kmeans_ml",
)


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}

_loaded = False


def register(name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
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
    return _ordered(ORACLES)
