"""Round-7 fourth wave (SURVEY.md §2 Table O): platform mechanics —
a custom PySpark Python DataSource (partition-parallel ingestion from
a non-file system), incremental mergeable-rollup maintenance, and a
data-quality expectations report (rule violations incl. referential
integrity).

Reference parity: the reference (coursework fork, SURVEY.md §0) has no
analog; these extend the engine along the platform axis with the
repo's contracts: closed-form deterministic generators the oracle can
replay, exact integer money, and partial-aggregate merge trees instead
of rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from engine.canon import dround
from engine.registry import register
from engine.session import EVENTS_US_SQL, T, load_events

# --------------------------------------------------------------------------
# Custom Python DataSource (deterministic generator, partition-parallel)
# --------------------------------------------------------------------------

_GEN_N = 100_000
_GEN_PARTS = 32
_GEN_MULT = 2654435761  # Knuth multiplicative constant
_GEN_MOD = 1 << 31


class _DetGenSource(DataSource):
    """Deterministic generator DataSource: row i of n carries
    value = (i · {mult}) mod 2^31. Partition p of P covers the integer
    range [n·p/P, n·(p+1)/P) — each InputPartition is read by an
    independent Python worker, the same shape an internal-service /
    REST-shard / queue reader would take at scale (the partition list
    is the shard map; no driver materialization)."""

    @classmethod
    def name(cls) -> str:
        return "spark_graft_detgen"

    def schema(self) -> str:
        return "id bigint, val bigint"

    def reader(self, schema):  # noqa: ANN001 - framework signature
        return _DetGenReader(self.options)


class _DetGenReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.n = int(options.get("n", _GEN_N))
        self.parts = int(options.get("parts", _GEN_PARTS))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):  # noqa: ANN001
        p = partition.value
        lo = self.n * p // self.parts
        hi = self.n * (p + 1) // self.parts
        for i in range(lo, hi):
            yield (i, (i * _GEN_MULT) % _GEN_MOD)


_DS_SQL = f"""
    SELECT CAST(i % 16 AS BIGINT) AS grp,
           COUNT(*) AS n_rows,
           CAST(SUM((i * {_GEN_MULT}) % {_GEN_MOD}) AS BIGINT) AS sum_val,
           CAST(MIN((i * {_GEN_MULT}) % {_GEN_MOD}) AS BIGINT) AS min_val,
           CAST(MAX((i * {_GEN_MULT}) % {_GEN_MOD}) AS BIGINT) AS max_val
    FROM range({_GEN_N}) t(i)
    GROUP BY 1 ORDER BY 1
"""


@register("scan_python_datasource", sql=_DS_SQL)
def scan_python_datasource(spark: SparkSession, sf: str) -> DataFrame:
    """Custom PySpark Python DataSource (the Spark 4 `DataSource` API):
    a partition-parallel reader for data that does NOT live in files —
    the integration point for internal services, queue shards, or
    proprietary stores. Here the source is a closed-form deterministic
    generator (row i → (i·Knuth) mod 2^31 over {_GEN_PARTS} independent
    InputPartitions) so the oracle replays it exactly from
    `range({_GEN_N})`; swapping the generator body for a real client
    keeps every Spark-side property: the partition list is the shard
    map, each partition streams through its own Python worker
    (BatchScan (Python) — NOT per-row BatchEvalPython in a hot
    expression), and the downstream groupBy is ordinary partial-
    aggregable JVM work. sf is unused by construction — the source is
    the thing under test, not the tables."""
    try:
        spark.dataSource.register(_DetGenSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("spark_graft_detgen")
        .option("n", str(_GEN_N))
        .option("parts", str(_GEN_PARTS))
        .load()
    )
    return (
        df.groupBy((F.col("id") % 16).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("grp")
    )


# --------------------------------------------------------------------------
# Incremental mergeable rollup (events: state + delta == full recompute)
# --------------------------------------------------------------------------

_IR_SQL = f"""
    WITH e AS ({EVENTS_US_SQL})
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_val_cents,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
           CAST(MIN(ts) AS DATE) AS first_date,
           CAST(MAX(ts) AS DATE) AS last_date
    FROM e GROUP BY 1 ORDER BY 1
"""


@register("agg_incremental_rollup", sql=_IR_SQL)
def agg_incremental_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance for an aggregation rollup: the
    engine does NOT rescan history when a new day arrives — it merges
    the materialized per-(day, type) PARTIAL aggregates (state) with
    the new day's partials (delta) and re-aggregates, the rollup-tree
    pattern that turns a 100 TB daily refresh into
    O(|new partition| + |state rows|).

    The oracle is the FULL recompute over all events — the comparison
    IS the proof that the merge is lossless: count/sum/min/max merge
    associatively, and n_days falls out exactly because state and
    delta partition the date domain (each (date, type) partial lives
    on exactly one side, so post-merge row count per type == distinct
    dates). Money rides exact integer cents through both levels, so
    partial-merge order cannot move a hash."""
    e = load_events(spark, sf).select(
        F.to_date("ts").alias("d"),
        "event_type",
        "ts",
        dround(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cutoff = e.agg(F.max("d")).first()[0]
    partial = lambda df: df.groupBy("d", "event_type").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    )
    state = partial(e.filter(F.col("d") < F.lit(cutoff)))
    delta = partial(e.filter(F.col("d") == F.lit(cutoff)))
    return (
        state.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").alias("sum_val_cents"),
            F.count(F.lit(1)).alias("n_days"),
            F.min("mn").cast("date").alias("first_date"),
            F.max("mx").cast("date").alias("last_date"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Data-quality expectations report (orders, incl. referential integrity)
# --------------------------------------------------------------------------

_EXP_SQL = """
    WITH m AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE o_totalprice <= 0) AS v_pos,
             COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
               AS v_dom,
             COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2001-01-01')
               AS v_date,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_uni
      FROM orders
    ),
    ri AS (
      SELECT COUNT(*) AS v_ri
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
    FROM (
      SELECT 'positive_totalprice' AS rule, n AS n_checked,
             v_pos AS n_violations FROM m
      UNION ALL SELECT 'status_domain', n, v_dom FROM m
      UNION ALL SELECT 'orderdate_sla', n, v_date FROM m
      UNION ALL SELECT 'unique_orderkey', n, v_uni FROM m
      UNION ALL SELECT 'ri_custkey_exists', n, v_ri FROM m, ri
    ) ORDER BY rule
"""


@register("scan_expectations_report", sql=_EXP_SQL)
def scan_expectations_report(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality expectations report (the Great-Expectations /
    dbt-test primitive): declarative rules over a table — positivity,
    value domain, freshness SLA, key uniqueness, referential integrity
    against a second table — each reporting checked/violation counts
    and a pass verdict; the gate a 100 TB ingest runs before
    promotion. The date-SLA rule genuinely FAILS on the shipped data
    (orders extend past the SLA horizon), so a silently-all-green
    report cannot pass the oracle.

    Plan shape: the four single-table rules share ONE partial-
    aggregable scan (conditional counts + a distinct count — no rule
    re-scans); referential integrity is a LEFT ANTI join aggregated to
    one row; both single-row results cross-join (broadcast) and
    unpivot via stack — violations traffic is 2 rows, never row-level
    quarantine output."""
    o = T(spark, sf, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("v_pos"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("v_dom"),
        F.count(
            F.when(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"), 1)
        ).alias("v_date"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "v_uni"
        ),
    )
    c = T(spark, sf, "customer").select("c_custkey")
    ri = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v_ri"))
    )
    stacked = m.crossJoin(F.broadcast(ri)).selectExpr(
        "stack(5,"
        " 'positive_totalprice', n, v_pos,"
        " 'status_domain', n, v_dom,"
        " 'orderdate_sla', n, v_date,"
        " 'unique_orderkey', n, v_uni,"
        " 'ri_custkey_exists', n, v_ri"
        ") as (rule, n_checked, n_violations)"
    )
    return stacked.select(
        "rule",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule")
