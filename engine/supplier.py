"""Supplier-dimension composites (TPC-H Q5/Q7/Q2 shapes).

Round-1 gap: no query joined the supplier table (VERDICT.md "What's
missing" #1), leaving the supplier⋈nation⋈lineitem arm of the star
schema unexercised. These three keys are the classic TPC-H shapes over
it (reference parity: the canonical handout's join/group pipelines —
SURVEY.md §2 Table A join+agg rows — applied to the supplier dimension;
no partsupp table exists in the testdata, so Q2's supplier-cost relation
is derived from lineitem instead).

Scale notes: supplier/nation/region are broadcast-sized at any SF
(BROADCAST_DIMS in engine.session); the only shuffles left are the
orders⋈lineitem join on orderkey and the final small groupBy. Q2's
per-part argmin is a window over the (part, supplier) aggregate —
WindowGroupLimit prunes to rn=1 without a full per-group sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.canon import dround
from engine.registry import register
from engine.session import T

_Q5_SQL = """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""


@register("join_q5_local_supplier", sql=_Q5_SQL)
def join_q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from LOCAL suppliers (customer and
    supplier in the same nation) per nation of one region. The
    c_nationkey = s_nationkey equi-condition rides on the supplier
    broadcast join — no extra shuffle."""
    cu = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = T(spark, sf, "lineitem")
    su = F.broadcast(T(spark, sf, "supplier"))
    na = F.broadcast(T(spark, sf, "nation"))
    re = F.broadcast(T(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    return (
        cu.join(o, cu.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            su,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(na, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(re, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


_Q7_SQL = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           YEAR(l_shipdate) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
"""


@register("join_q7_nation_volume", sql=_Q7_SQL)
def join_q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by ship year,
    both directions. Both nation arms are broadcast; the nation-pair
    filter lands in the broadcast joins so the big-side rows drop before
    the orders⋈lineitem shuffle."""
    su = F.broadcast(T(spark, sf, "supplier"))
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    cu = T(spark, sf, "customer")
    na = T(spark, sf, "nation")
    n1 = F.broadcast(na.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(na.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        su.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


_Q2_SQL = """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             ROUND(MIN(l_extendedprice / l_quantity) * 100) / 100 AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cost, l_suppkey) AS rn
      FROM cost
    )
    SELECT p_partkey, p_name, s_name, n_name, unit_cost
    FROM ranked
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE rn = 1 AND p_size <= 5
"""


@register("join_q2_min_cost_supplier", sql=_Q2_SQL)
def join_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp table in the testdata, so the
    supplier-cost relation derives from lineitem): per small part, the
    supplier offering the minimum unit cost, with deterministic
    tie-break on s_suppkey. The argmin is ROW_NUMBER pruned to rn=1 —
    Spark executes it as WindowGroupLimit, never a full per-group sort.
    unit_cost is rounded before ranking so both engines rank identical
    values (raw double division is ulp-sensitive).

    r13 (guide §3.2): the p_size <= 5 predicate keeps ~10% of parts,
    so the small-parts key set pre-filters lineitem via a SEMI join
    BEFORE the (partkey, suppkey) aggregate and the ranking window —
    both shuffles now carry only qualifying parts' rows. Equivalent by
    construction: the rank is PARTITION BY l_partkey, so dropping other
    partkeys cannot change any surviving group's rn=1 row, and
    non-qualifying partkeys were discarded by the final inner join with
    part anyway.

    r14 (VERDICT r13 task 6): NO explicit broadcast hint on the
    fact-proportional sides. p_size <= 5 keeps ~10% of `part`, which
    GROWS with SF (~2B keys at 100 TB) — an explicit F.broadcast pins a
    strategy AQE cannot demote and would OOM the driver at scale. The
    planner/AQE now picks from actual sizes: broadcast semi at local
    SFs (verified in the plan), sort-merge semi — with the runtime
    Bloom filter eligible to prune the fact scan
    (join_runtime_bloom_filter demonstrates the pattern) — once the key
    set outgrows the threshold. Only `nation` (fixed 25 rows at every
    SF) keeps its hint."""
    li = T(spark, sf, "lineitem")
    small_parts = (
        T(spark, sf, "part").filter(F.col("p_size") <= 5).select("p_partkey")
    )
    li = li.join(
        small_parts, li["l_partkey"] == small_parts["p_partkey"], "semi"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        dround(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias(
            "unit_cost"
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    ranked = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = T(spark, sf, "part").filter(F.col("p_size") <= 5)
    su = T(spark, sf, "supplier")
    na = F.broadcast(T(spark, sf, "nation"))
    return (
        ranked.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(na, F.col("n_nationkey") == F.col("s_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
    )
