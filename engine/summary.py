"""tu_* — ports of the timeusage assignment (SURVEY.md §2 Table C;
canonical handout timeusage/src/main/scala/timeusage/TimeUsage.scala:
`classifiedColumns` ~L80, `timeUsageSummary` ~L110-140, `timeUsageGrouped`
~L150, `timeUsageGroupedSql` ~L160, `timeUsageGroupedTyped` ~L180 —
checkout empty at build time, SURVEY.md §0).

FIXTURES.md B4 port onto the events table: activity classes
primary = {view, click}, work = {purchase, signup}, other = {error};
minutes→hours analog = sum(value)/60; grouping keys derived from
user_id (working = uid%3<2, sex-analog = uid%2, age-band = uid%9
tertile); the telfs<=4 response filter analog = uid%10 != 9.

The course's key invariant (TimeUsageSuite [H]): the DataFrame path,
the SQL-string path, and the typed path must produce IDENTICAL results
— tu_grouped == tu_grouped_sql == tu_grouped_typed, asserted in
tests/test_reference_semantics.py. The typed Dataset lambdas (A29) are
represented by the pandas-UDF path, the same optimizer-opacity
trade-off in PySpark terms (SURVEY.md §2 A29 note).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from engine.canon import dround
from engine.registry import register
from engine.session import T

_SUMMARY_SQL = """
    SELECT user_id,
           CASE WHEN user_id % 3 < 2 THEN 'working' ELSE 'idle' END AS working,
           CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS sex,
           CASE WHEN user_id % 9 < 3 THEN 'young'
                WHEN user_id % 9 < 6 THEN 'active' ELSE 'elder' END AS age,
           ROUND(COALESCE(SUM(CASE WHEN event_type IN ('view','click')
                                   THEN value END), 0) / 60 * 100) / 100 AS primary_h,
           ROUND(COALESCE(SUM(CASE WHEN event_type IN ('purchase','signup')
                                   THEN value END), 0) / 60 * 100) / 100 AS work_h,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'error'
                                   THEN value END), 0) / 60 * 100) / 100 AS other_h
    FROM events
    WHERE user_id % 10 <> 9
    GROUP BY user_id
"""

# Average-of-hours rounded to 1 decimal. Plain ROUND(AVG(x)*10)/10 is
# engine-unstable when a group's true average sits exactly on a .05
# boundary (summation order decides the side) — so the average is
# computed in exact integer cents: per-row cents are identical on both
# engines, SUM of ints is exact, and ONE final double division is
# IEEE-identical everywhere. (Runs through both spark.sql and DuckDB —
# the text is shared verbatim.)
# (explicit DOUBLE casts: spark.sql parses a bare `10.0` literal as
# DECIMAL and would propagate decimal types through the division)
_AVG1 = (
    "ROUND(SUM(CAST(ROUND({c} * 100) AS BIGINT)) / (COUNT(*) * CAST(10 AS DOUBLE)))"
    " / CAST(10 AS DOUBLE) AS {c}"
)

_GROUPED_SQL = f"""
    WITH s AS ({_SUMMARY_SQL})
    SELECT working, sex, age,
           {_AVG1.format(c="primary_h")},
           {_AVG1.format(c="work_h")},
           {_AVG1.format(c="other_h")}
    FROM s
    GROUP BY working, sex, age
    ORDER BY working, sex, age
"""


def summarize(ev: DataFrame) -> DataFrame:
    """`timeUsageSummary` [H]: classify, bucket-sum, scale, filter."""
    uid = F.col("user_id")

    def bucket(types: tuple[str, ...]) -> F.Column:
        s = F.sum(F.when(F.col("event_type").isin(*types), F.col("value")))
        return dround(F.coalesce(s, F.lit(0.0)) / 60, 2)

    return (
        ev.filter(uid % 10 != 9)  # A26: `.where($"telfs" <= 4)` analog
        .groupBy("user_id")
        .agg(
            bucket(("view", "click")).alias("primary_h"),
            bucket(("purchase", "signup")).alias("work_h"),
            bucket(("error",)).alias("other_h"),
        )
        .select(
            "user_id",
            F.when(uid % 3 < 2, "working").otherwise("idle").alias("working"),
            F.when(uid % 2 == 0, "even").otherwise("odd").alias("sex"),
            F.when(uid % 9 < 3, "young")
            .when(uid % 9 < 6, "active")
            .otherwise("elder")
            .alias("age"),
            "primary_h",
            "work_h",
            "other_h",
        )
    )


@register("tu_summary", sql=_SUMMARY_SQL)
def tu_summary(spark: SparkSession, sf: str) -> DataFrame:
    return summarize(T(spark, sf, "events")).select(
        "user_id", "working", "sex", "age", "primary_h", "work_h", "other_h"
    )


@register("tu_grouped", sql=_GROUPED_SQL)
def tu_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """`timeUsageGrouped` (A27) [H]: 3-key grouped averages, round(_, 1),
    ordered by the keys — the native-Column path."""
    s = summarize(T(spark, sf, "events"))

    def avg1(c: str) -> F.Column:
        cents = F.sum(F.round(F.col(c) * 100, 0).cast("long"))
        return (F.round(cents / (F.count("*") * 10.0), 0) / 10).alias(c)

    return (
        s.groupBy("working", "sex", "age")
        .agg(avg1("primary_h"), avg1("work_h"), avg1("other_h"))
        .orderBy("working", "sex", "age")
    )


@register("tu_grouped_sql", sql=_GROUPED_SQL)
def tu_grouped_sql(spark: SparkSession, sf: str) -> DataFrame:
    """`timeUsageGroupedSql` (A28) [H]: the same computation as a literal
    SQL string through spark.sql — must equal tu_grouped. The SQL text is
    shared with the DuckDB oracle verbatim (both are ANSI here)."""
    T(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(_GROUPED_SQL)


@register("tu_grouped_typed", sql=_GROUPED_SQL)
def tu_grouped_typed(spark: SparkSession, sf: str) -> DataFrame:
    """`timeUsageGroupedTyped` (A29) [H]: the typed-lambda path, realized
    as Arrow-vectorized pandas aggregation — must equal both others."""

    @pandas_udf("double")
    def pd_avg1(v: pd.Series) -> float:
        # same exact-cents average as the other two paths (see _AVG1)
        cents = int(v.mul(100).round().sum())
        import math

        return math.floor(cents / (len(v) * 10.0) + 0.5) / 10

    s = summarize(T(spark, sf, "events"))
    return (
        s.groupBy("working", "sex", "age")
        .agg(
            pd_avg1("primary_h").alias("primary_h"),
            pd_avg1("work_h").alias("work_h"),
            pd_avg1("other_h").alias("other_h"),
        )
        .orderBy("working", "sex", "age")
    )
