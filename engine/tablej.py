"""Round-5 wave 2 (SURVEY.md §2 Table J): weighted sampling, basket
co-occurrence mining, and lakehouse file-maintenance planning — three
operator families a 100 TB training-data platform runs routinely that
the prior tables didn't yet cover.

Scale design notes (100 TB posture):
- priority sampling: the whole corpus collapses through ONE
  TakeOrderedAndProject (per-partition top-k + driver merge of k-row
  heaps — no global sort, no shuffle of the data). The priority is a
  pure per-row expression (md5-derived uniform, one IEEE division), so
  the scan stays in whole-stage codegen. This is Duffield–Lund–Thorup
  priority sampling: q_i = w_i / u_i, keep the k largest — a provably
  near-optimal weighted sample w.r.t. subset-sum estimation.
- frequent pairs: the pair join is per-basket (equi-join on the basket
  key), so its cost is Σ_b |b|², bounded by the ITEM-TYPE cardinality
  squared per basket — never corpus², and never a cross join. Marginals
  and the basket total are one extra aggregation each; the single-row
  total is broadcast back (BroadcastNestedLoopJoin on 1 row, not a
  CartesianProduct).
- compaction planning: the input is the FILES-METADATA relation (the
  table catalog / manifest), already orders of magnitude smaller than
  the data; the plan is one window cumsum + one aggregation per
  partition. This mirrors what OPTIMIZE-style bin packing does: order
  files within a partition, accumulate toward a target size, emit bins.
  All arithmetic is exact integers, so the DuckDB oracle replays the
  identical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.canon import dround
from engine.registry import register
from engine.session import T

# --------------------------------------------------------------------------
# Weighted sampling without replacement: priority sampling (top-k by w/u)
# --------------------------------------------------------------------------

_PRIORITY_K = 50

#: 2^60 — the md5-derived 60-bit integer maps to a uniform in (0, 1]
#: via (h + 1) / 2^60. Long→double conversion and the division are both
#: IEEE-determined, so Spark and DuckDB compute bit-identical uniforms.
_U_DENOM = float(1 << 60)

_PRIORITY_SQL = f"""
    SELECT doc_id,
           n_chars AS weight,
           ROUND(n_chars /
                 ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   + 1) / {int(_U_DENOM)}.0) * 1e4) / 1e4 AS priority
    FROM documents
    ORDER BY priority DESC, doc_id
    LIMIT {_PRIORITY_K}
"""


def priority_keyed(df: DataFrame, id_col: str, weight_col: str) -> DataFrame:
    """Attach the priority-sampling key q = w / u to each row, where
    u ∈ (0, 1] is a portable md5-derived uniform of the row id. Every
    op is IEEE-exact (integer+1, long→double cast, one division), so
    any engine with md5 reproduces the identical priorities — the
    contract that lets the oracle value-check the SAMPLE ITSELF, not
    just its size."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_U_DENOM)
    return df.withColumn(
        "priority", dround(F.col(weight_col).cast("double") / u, 4)
    )


@register("sample_weighted_priority", sql=_PRIORITY_SQL)
def sample_weighted_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sample WITHOUT replacement of 50 documents, weight =
    n_chars (longer documents proportionally likelier) — priority
    sampling (Duffield–Lund–Thorup): per row draw u ~ U(0,1], keep the
    k rows with the largest priority q = w/u. The sampler behind
    "sample the corpus by token count" in a mixing pipeline, chosen
    over A-ES (u^(1/w)) because q = w/u needs no pow/log — only IEEE
    division — so the draw is bit-reproducible across engines.

    Plan shape: orderBy(priority).limit(k) → TakeOrderedAndProject
    (per-partition top-k heaps merged on the driver; the corpus itself
    never shuffles). Ordering uses the ROUNDED priority with the doc id
    as tie-break, so both engines rank the same boundary rows."""
    d = T(spark, sf, "documents")
    return (
        priority_keyed(d, "doc_id", "n_chars")
        .select("doc_id", F.col("n_chars").alias("weight"), "priority")
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_PRIORITY_K)
    )


# --------------------------------------------------------------------------
# Frequent pairs (market-basket co-occurrence with support + lift)
# --------------------------------------------------------------------------

_PAIR_MIN_USERS = 10

_FREQUENT_PAIRS_SQL = f"""
    WITH baskets AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM baskets),
    marg AS (SELECT event_type, COUNT(*) AS m FROM baskets GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS pair_users
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, pair_users,
           ROUND(pair_users / (n.n_users * 1.0) * 1e6) / 1e6 AS support,
           ROUND(pair_users * n.n_users / (ma.m * mb.m * 1.0) * 1e4) / 1e4
             AS lift
    FROM pairs
    JOIN marg ma ON ma.event_type = type_a
    JOIN marg mb ON mb.event_type = type_b
    CROSS JOIN n
    WHERE pair_users >= {_PAIR_MIN_USERS}
    ORDER BY pair_users DESC, type_a, type_b
"""


def frequent_pairs(baskets: DataFrame, min_count: int) -> DataFrame:
    """Co-occurring item pairs over (basket_id, item) rows with support
    and lift — the candidate-pair pass of Apriori/FP-growth, kept fully
    relational: the self-join is keyed on basket_id, so work is
    Σ_b C(|b|, 2) (bounded by item-type cardinality per basket), never
    an all-pairs compare. lift = P(ab) / (P(a)·P(b)) in exact integer
    cross-multiplication before ONE final double division."""
    b = baskets.select(
        F.col(baskets.columns[0]).alias("bid"),
        F.col(baskets.columns[1]).alias("item"),
    ).distinct()
    tot = b.agg(F.count_distinct("bid").alias("n_users"))
    marg = b.groupBy("item").agg(F.count(F.lit(1)).alias("m"))
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.bid") == F.col("y.bid"))
            & (F.col("x.item") < F.col("y.item")),
        )
        .groupBy(
            F.col("x.item").alias("type_a"), F.col("y.item").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_users"))
        .filter(F.col("pair_users") >= min_count)
    )
    ma = marg.select(F.col("item").alias("type_a"), F.col("m").alias("ma"))
    mb = marg.select(F.col("item").alias("type_b"), F.col("m").alias("mb"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "pair_users",
            dround(F.col("pair_users") / F.col("n_users").cast("double"), 6).alias(
                "support"
            ),
            dround(
                (F.col("pair_users") * F.col("n_users"))
                / (F.col("ma") * F.col("mb")).cast("double"),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("pair_users").desc(), "type_a", "type_b")
    )


@register("agg_frequent_pairs", sql=_FREQUENT_PAIRS_SQL)
def agg_frequent_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket pair mining over user event-type baskets: which
    event types co-occur in the same user's history, with support
    (share of users) and lift (observed / independence-expected). The
    first pass of any association-rule or co-engagement analysis.

    Baskets = DISTINCT (user_id, event_type) — the per-basket pair join
    is capped at C(#event_types, 2) pairs per user, linear in users.
    Marginals and the single-row basket total are broadcast back onto
    the pair relation (the 1-row total rides a BroadcastNestedLoopJoin,
    not a CartesianProduct)."""
    ev = T(spark, sf, "events").select("user_id", "event_type")
    return frequent_pairs(ev, _PAIR_MIN_USERS)


# --------------------------------------------------------------------------
# Compaction plan (small-file bin packing over a files-metadata relation)
# --------------------------------------------------------------------------

_COMPACT_TARGET = 32_768  # target bin size in bytes
_COMPACT_ROW_BYTES = 128  # synthetic per-row footprint of the files fixture

_COMPACTION_SQL = f"""
    WITH files AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS part,
             l_orderkey % 8 AS file_id,
             COUNT(*) * {_COMPACT_ROW_BYTES} AS bytes
      FROM lineitem GROUP BY 1, 2
    ),
    planned AS (
      SELECT part, file_id, bytes,
             COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM files
    )
    SELECT part, CAST(cum_before // {_COMPACT_TARGET} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes
    FROM planned
    GROUP BY part, cum_before // {_COMPACT_TARGET}
    ORDER BY part, bin
"""


def compaction_bins(files: DataFrame, target: int) -> DataFrame:
    """Bin-pack a (part, file_id, bytes) files relation into compaction
    groups of ~``target`` bytes: within each partition, files in
    file_id order accumulate; a file's bin is floor(bytes-before /
    target). The relational form of OPTIMIZE-style greedy packing —
    deterministic, one window cumsum + one aggregation, exact integer
    arithmetic throughout (a bin may overshoot the target by at most
    one file, the same guarantee greedy accumulation gives)."""
    w = (
        Window.partitionBy("part")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "cum_before", F.coalesce(F.sum("bytes").over(w), F.lit(0))
    )
    return (
        planned.withColumn("bin", F.expr(f"cum_before div {target}"))
        .groupBy("part", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
        )
        .orderBy("part", "bin")
    )


@register("scan_compaction_plan", sql=_COMPACTION_SQL)
def scan_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction planning — the lakehouse maintenance op
    that turns a files-metadata relation into OPTIMIZE work units: per
    table partition (ship month), pack files (order-key buckets, bytes
    = rows × 128 as the synthetic footprint) into ~32 KB bins by
    cumulative size. At 100 TB the input is the catalog's file
    manifest — already tiny next to the data — and the output drives
    the rewrite jobs; the data itself is never read. Spark's bin
    assignment (`div` on exact longs) and DuckDB's (`//`) agree on all
    non-negative values."""
    li = T(spark, sf, "lineitem")
    files = li.groupBy(
        F.date_trunc("month", "l_shipdate").cast("date").alias("part"),
        F.pmod("l_orderkey", F.lit(8)).alias("file_id"),
    ).agg((F.count(F.lit(1)) * _COMPACT_ROW_BYTES).alias("bytes"))
    return compaction_bins(files, _COMPACT_TARGET)
