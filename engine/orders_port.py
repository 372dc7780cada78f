"""so_grouped / so_scored / so_vectors — ports of the stackoverflow
assignment's join+group pipeline (SURVEY.md §2 Table C; canonical
handout stackoverflow/src/main/scala/stackoverflow/StackOverflow.scala:
`groupedPostings` ~L55, `scoredPostings`/`answerHighScore` ~L70,
`vectorPostings` ~L85 — checkout empty at build time, SURVEY.md §0).

Mapping: question→answers ≅ order→lineitems. Questions with no answers
are dropped by the inner join [H]; orders with no lineitems likewise.
`langSpread = 50000` is the reference's skew/spread constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.canon import dround, joined
from engine.registry import register
from engine.session import T

LANG_SPREAD = 50000  # StackOverflow.scala `langSpread` [H]


@register(
    "so_grouped",
    sql="""
    SELECT o_orderkey, COUNT(*) AS n_items,
           STRING_AGG(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS lines
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    """,
)
def so_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """`groupedPostings` [H]: inner equi-join then group by the parent
    key. The reference materializes Iterable[(Q,A)] per key (groupByKey);
    we keep only what downstream needs — bounded sorted list + count —
    the aggregation-not-materialization lesson at scale."""
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            joined(F.sort_array(F.collect_list("l_linenumber"))).alias("lines"),
        )
    )


@register(
    "so_scored",
    sql="""
    SELECT o_orderkey, MAX(l_extendedprice) AS high_score, COUNT(*) AS n
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    """,
)
def so_scored(spark: SparkSession, sf: str) -> DataFrame:
    """`scoredPostings`/`answerHighScore` [H]: per question the max
    answer score ≅ per order the max lineitem price. One partial+final
    max — no group materialization."""
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderkey")
        .agg(F.max("l_extendedprice").alias("high_score"), F.count("*").alias("n"))
    )


@register(
    "so_vectors",
    sql=f"""
    SELECT o_orderkey,
           (o_orderkey % 10) * {LANG_SPREAD} AS x,
           CAST(ROUND(MAX(l_extendedprice) * 1.0) AS BIGINT) AS y
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    """,
)
def so_vectors(spark: SparkSession, sf: str) -> DataFrame:
    """`vectorPostings` [H]: (langIndex × langSpread, highScore) feature
    vectors. FIXTURES.md B4 port: label = o_orderkey % 10, value = the
    scored max, rounded to int. The ×50000 spread is the reference's own
    trick to dominate the distance metric with the label dimension."""
    scored = so_scored(spark, sf)
    return scored.select(
        "o_orderkey",
        ((F.col("o_orderkey") % 10) * LANG_SPREAD).alias("x"),
        dround(F.col("high_score")).cast("long").alias("y"),
    )
