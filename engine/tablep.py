"""Round-7 fourth wave (SURVEY.md §2 Table P): analytics depth along
four established axes — feature engineering (WOE/IV scorecard encoding,
one-hot vocabulary), text statistics (PMI collocations), time-series
structure (CUSUM changepoint, multi-lag ACF), customer analytics
(cohort LTV, delta-method ratio CI), graph (personalized PageRank in
exact integer arithmetic), join strategy (explicit Bloom-prefilter
semi-join with a measured FP audit), and retrieval (reciprocal-rank
fusion of two ANN rankings).

Reference parity: the reference (coursework fork, SURVEY.md §0) has no
analog; these extend the engine along the training-data / analytics
platform axis under the repo's established contracts: exact integer
statistics (decimal/HUGEINT-promoted where int64 would overflow at
100 TB), one-division rational arithmetic before any double rounds,
bounded windows only (calendar-day series, category-sized vocabularies),
broadcast dimensions, and the portable md5 hash family the oracle
rebuilds bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.canon import dround
from engine.registry import register
from engine.session import T, scratch_cache

# --------------------------------------------------------------------------
# Weight of Evidence / Information Value (orders priority vs final status)
# --------------------------------------------------------------------------

_WOE_SQL = """
    WITH c AS (
      SELECT o_orderpriority,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_bad,
             COUNT(*) FILTER (WHERE o_orderstatus <> 'F') AS n_good
      FROM orders GROUP BY 1
    ),
    t AS (SELECT SUM(n_good) AS g, SUM(n_bad) AS b FROM c)
    SELECT c.o_orderpriority, c.n_good, c.n_bad,
           ROUND(LN(CAST((2 * CAST(c.n_good AS HUGEINT) + 1) * t.b AS DOUBLE)
                    / CAST((2 * CAST(c.n_bad AS HUGEINT) + 1) * t.g AS DOUBLE))
                 * 1e6) / 1e6 AS woe,
           ROUND(CAST(CAST(c.n_good AS HUGEINT) * t.b
                      - CAST(c.n_bad AS HUGEINT) * t.g AS DOUBLE)
                 / CAST(CAST(t.g AS HUGEINT) * t.b AS DOUBLE)
                 * LN(CAST((2 * CAST(c.n_good AS HUGEINT) + 1) * t.b AS DOUBLE)
                      / CAST((2 * CAST(c.n_bad AS HUGEINT) + 1) * t.g
                             AS DOUBLE))
                 * 1e6) / 1e6 AS iv_term
    FROM c, t ORDER BY c.o_orderpriority
"""


@register("feat_woe_iv", sql=_WOE_SQL)
def feat_woe_iv(spark: SparkSession, sf: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value encoding of a categorical
    feature against a binary outcome (order finalized = 'F') — the
    scorecard-model transform next to feat_target_encode: WOE(cat) =
    ln(distr_good/distr_bad) with half-count (Laplace ½) smoothing, and
    the per-category IV term (distr_good − distr_bad)·WOE whose sum
    ranks feature predictiveness.

    Exactness contract: the smoothed odds ratio is ONE division of two
    exact integers — ((2g+1)·B)/((2b+1)·G) — entering ln() as the same
    IEEE double in both engines; the IV factor is likewise the single
    division (g·B − b·G)/(G·B). Counts promote to decimal/HUGEINT so
    the cross-products survive 100 TB row counts. Plan: one partial-
    aggregable groupBy to category rows (cardinality-sized), totals as
    a broadcast single row — no window, no second fact shuffle."""
    dec = "decimal(38,0)"
    c = (
        T(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") != "F", 1)).alias("n_good"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_bad"),
        )
    )
    t = c.agg(F.sum("n_good").alias("g"), F.sum("n_bad").alias("b"))
    woe_raw = F.log(
        ((F.col("n_good").cast(dec) * 2 + 1) * F.col("b")).cast("double")
        / ((F.col("n_bad").cast(dec) * 2 + 1) * F.col("g")).cast("double")
    )
    iv = (
        (
            F.col("n_good").cast(dec) * F.col("b")
            - F.col("n_bad").cast(dec) * F.col("g")
        ).cast("double")
        / (F.col("g").cast(dec) * F.col("b")).cast("double")
    ) * woe_raw
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "o_orderpriority",
            "n_good",
            "n_bad",
            dround(woe_raw, 6).alias("woe"),
            dround(iv, 6).alias("iv_term"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# One-hot vocabulary build + encoded audit slice (customer market segment)
# --------------------------------------------------------------------------

_OH_TOPK = 3
_OH_SAMPLE = 13

_OH_SQL = f"""
    WITH counts AS (
      SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1
    ),
    vocab AS (
      SELECT c_mktsegment,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, c_mktsegment) - 1 AS idx
      FROM counts
    )
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(COALESCE(v.idx, -1) AS BIGINT) AS feature_index,
           v.idx IS NULL AS is_other
    FROM customer c
    LEFT JOIN (SELECT * FROM vocab WHERE idx < {_OH_TOPK}) v
      ON v.c_mktsegment = c.c_mktsegment
    WHERE c.c_custkey % {_OH_SAMPLE} = 0
    ORDER BY c.c_custkey
"""


@register("feat_onehot_vocab", sql=_OH_SQL)
def feat_onehot_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """One-hot vocabulary construction (top-{_OH_TOPK} categories by
    frequency, deterministic tie-break, everything else → the OTHER
    bucket) plus the encoded audit slice (c_custkey % {_OH_SAMPLE} = 0)
    — the dictionary-building half of categorical featurization that
    feat_hashing_trick deliberately skips.

    The vocabulary is built from the FULL table (one partial-aggregable
    groupBy; its ranking window runs over category cardinality, not
    rows) and broadcasts back onto the slice — at 100 TB the only
    cross-stage traffic is the category dictionary. Unknown categories
    map to index -1, the standard OOV convention."""
    counts = (
        T(spark, sf, "customer").groupBy("c_mktsegment").agg(F.count("*").alias("cnt"))
    )
    # ranking window over the CATEGORY relation — cardinality-sized
    w = Window.orderBy(F.col("cnt").desc(), "c_mktsegment")
    vocab = (
        counts.withColumn("idx", F.row_number().over(w) - 1)
        .filter(F.col("idx") < _OH_TOPK)
        .select("c_mktsegment", "idx")
    )
    return (
        T(spark, sf, "customer")
        .filter(F.col("c_custkey") % _OH_SAMPLE == 0)
        .join(F.broadcast(vocab), "c_mktsegment", "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("idx", F.lit(-1)).cast("long").alias("feature_index"),
            F.col("idx").isNull().alias("is_other"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# PMI collocations (documents bigrams vs unigram independence)
# --------------------------------------------------------------------------

_PMI_MIN = 5
_PMI_TOPN = 20

_PMI_SQL = f"""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
    uni AS MATERIALIZED (
      SELECT tok, COUNT(*) AS cu FROM (
        SELECT UNNEST(tk) AS tok FROM t) GROUP BY tok
    ),
    bg AS MATERIALIZED (
      SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk) - 1),
                                   i -> tk[i] || ' ' || tk[i + 1])) AS big
      FROM t WHERE LEN(tk) >= 2
    ),
    cb AS MATERIALIZED (
      SELECT big, COUNT(*) AS c FROM bg GROUP BY big HAVING COUNT(*) >= {_PMI_MIN}
    ),
    tot AS (SELECT (SELECT COUNT(*) FROM bg) AS n,
                   (SELECT SUM(cu) FROM uni) AS m)
    SELECT w1, w2, c AS n_pair, pmi FROM (
      SELECT STRING_SPLIT(cb.big, ' ')[1] AS w1,
             STRING_SPLIT(cb.big, ' ')[2] AS w2, cb.c,
             ROUND(LN(CAST(CAST(cb.c AS HUGEINT) * tot.m * tot.m AS DOUBLE)
                      / CAST(CAST(tot.n AS HUGEINT) * u1.cu * u2.cu AS DOUBLE))
                   * 1e6) / 1e6 AS pmi
      FROM cb
      JOIN uni u1 ON u1.tok = STRING_SPLIT(cb.big, ' ')[1]
      JOIN uni u2 ON u2.tok = STRING_SPLIT(cb.big, ' ')[2]
      CROSS JOIN tot)
    ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_TOPN}
"""


@register("text_collocation_pmi", sql=_PMI_SQL)
def text_collocation_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: rank adjacent
    token pairs by PMI = ln(p(xy)/(p(x)p(y))) with a min-count floor of
    {_PMI_MIN} — the classic collocation detector (phrases like "new
    york" score high because their joint count beats the unigram-
    independence prediction), the statistical sibling of the raw-count
    text_bigram_lm.

    PMI is evaluated as ONE division of exact integer cross-products —
    (c_xy·M²)/(N·c_x·c_y), decimal/HUGEINT-promoted (M² alone exceeds
    int64 at 100 TB token counts) — entering ln() as the same IEEE
    double in both engines, then 1e-6 rounding orders the top-{_PMI_TOPN}
    with a (w1, w2) tie-break. Plan: the shifted-slice zip_with builds
    pairs without a self-join; unigram and bigram counts are partial-
    aggregable shuffles; the pair→unigram lookups are equi-joins on the
    token key (hot-token skew is AQE-split); totals ride as a broadcast
    single row."""
    from engine.session import parallelize_scan, scan_units

    dec = "decimal(38,0)"
    d = parallelize_scan(T(spark, sf, "documents"), scan_units(sf, "documents"))
    tk = d.select("doc_id", F.split("text", " ").alias("tk"))
    tk = scratch_cache(tk)
    uni = tk.select(F.explode("tk").alias("tok")).groupBy("tok").agg(
        F.count("*").alias("cu")
    )
    bg = (
        tk.filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("tk", 1, F.size("tk") - 1),
                    F.slice("tk", 2, F.size("tk") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("big")
        )
    )
    bg = scratch_cache(bg)
    cb = (
        bg.groupBy("big")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= _PMI_MIN)
    )
    tot = bg.agg(F.count("*").alias("n")).crossJoin(
        uni.agg(F.sum("cu").alias("m"))
    )
    w1 = F.split("big", " ").getItem(0)
    w2 = F.split("big", " ").getItem(1)
    scored = (
        cb.join(uni.select(F.col("tok").alias("t1"), F.col("cu").alias("cu1")), w1 == F.col("t1"))
        .join(uni.select(F.col("tok").alias("t2"), F.col("cu").alias("cu2")), w2 == F.col("t2"))
        .crossJoin(F.broadcast(tot))
        .select(
            w1.alias("w1"),
            w2.alias("w2"),
            F.col("c").alias("n_pair"),
            dround(
                F.log(
                    (F.col("c").cast(dec) * F.col("m") * F.col("m")).cast("double")
                    / (F.col("n").cast(dec) * F.col("cu1") * F.col("cu2")).cast(
                        "double"
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(_PMI_TOPN)


# --------------------------------------------------------------------------
# CUSUM changepoint scan (daily order revenue)
# --------------------------------------------------------------------------

_CUSUM_TOPN = 5

_CUSUM_SQL = f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT day, x,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             SUM(x) OVER (ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM daily
    ),
    st AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM idx),
    stat AS (
      SELECT day, CAST(st.n AS HUGEINT) * cum - t * st.s AS g
      FROM idx, st
    )
    SELECT day, CAST(g AS DOUBLE) AS cusum_stat, rnk FROM (
      SELECT day, g, ROW_NUMBER() OVER (ORDER BY ABS(g) DESC, day) AS rnk
      FROM stat)
    WHERE rnk <= {_CUSUM_TOPN} ORDER BY rnk
"""


@register("ts_cusum_changepoint", sql=_CUSUM_SQL)
def ts_cusum_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM changepoint scan over the daily order-revenue series: the
    day maximizing |Σ_{{i≤t}}(x_i − mean)| is the level-shift estimate
    (the offline CUSUM statistic behind ts_step_detection's online
    z-score flavor). Reported: the top-{_CUSUM_TOPN} candidate days.

    Exactness: mean subtraction is cleared of division — the statistic
    is computed as g_t = n·cum_t − t·S (all exact integers, promoted to
    decimal/HUGEINT because n·cum exceeds int64 at 100 TB daily
    volumes), so ranking by |g_t| is exact integer comparison; the
    output double is exact at test scale (< 2^53). Plan: one partial-
    aggregable groupBy to the day series, then windows over the
    CALENDAR-BOUNDED daily relation (the repo's documented post-
    aggregation exception — a few thousand rows regardless of fact
    size)."""
    dec = "decimal(38,0)"
    daily = (
        T(spark, sf, "orders")
        .select(
            F.date_trunc("day", "o_orderdate").alias("day"),
            dround(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("x"))
    )
    w = Window.orderBy("day")  # calendar-bounded post-agg series
    idx = daily.select(
        "day",
        "x",
        F.row_number().over(w).alias("t"),
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    st = daily.agg(F.count("*").alias("n"), F.sum(F.col("x").cast(dec)).alias("s"))
    stat = idx.crossJoin(F.broadcast(st)).select(
        "day",
        (
            F.col("n").cast(dec) * F.col("cum").cast(dec)
            - F.col("t").cast(dec) * F.col("s")
        ).alias("g"),
    )
    wr = Window.orderBy(F.abs(F.col("g")).desc(), "day")
    return (
        stat.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _CUSUM_TOPN)
        .select("day", F.col("g").cast("double").alias("cusum_stat"), "rnk")
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Multi-lag autocorrelation profile (daily order revenue, lags 1..7)
# --------------------------------------------------------------------------

_ACF_MAXLAG = 7

_ACF_SQL = f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily
    ),
    st AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM idx),
    dd AS MATERIALIZED (
      SELECT t, CAST(st.n AS HUGEINT) * x - st.s AS d FROM idx, st
    ),
    den AS (SELECT SUM(d * d) AS den FROM dd),
    ks AS (SELECT UNNEST(GENERATE_SERIES(1, {_ACF_MAXLAG})) AS lag)
    SELECT ks.lag, COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(a.d * b.d) AS DOUBLE) / CAST(den.den AS DOUBLE)
                 * 1e6) / 1e6 AS acf
    FROM ks
    JOIN dd a ON TRUE
    JOIN dd b ON b.t = a.t + ks.lag
    CROSS JOIN den
    GROUP BY ks.lag, den.den ORDER BY ks.lag
"""


@register("ts_acf_multi_lag", sql=_ACF_SQL)
def ts_acf_multi_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation profile of daily revenue at lags 1..{_ACF_MAXLAG}
    — the weekly-seasonality diagnostic (a lag-7 spike = weekday
    pattern), generalizing ts_autocorr_lag1's single coefficient to the
    correlogram a seasonality detector actually consumes.

    r_k = Σ d_t·d_{{t+k}} / Σ d_t² with d_t = n·x_t − S: mean
    subtraction cleared of division, every product an exact
    decimal/HUGEINT integer (d² overflows int64 at 100 TB daily sums),
    ONE final division into the rounded double. Plan: one partial-
    aggregable groupBy to the calendar-bounded day series; the lag
    pairing is an equi-join on t+k over that bounded relation (the
    documented post-aggregation exception), never over raw rows."""
    dec = "decimal(38,0)"
    daily = (
        T(spark, sf, "orders")
        .select(
            F.date_trunc("day", "o_orderdate").alias("day"),
            dround(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("x"))
    )
    w = Window.orderBy("day")  # calendar-bounded post-agg series
    idx = daily.select("x", F.row_number().over(w).alias("t"))
    st = daily.agg(F.count("*").alias("n"), F.sum(F.col("x").cast(dec)).alias("s"))
    dd = scratch_cache(
        idx.crossJoin(F.broadcast(st)).select(
            "t",
            (F.col("n").cast(dec) * F.col("x").cast(dec) - F.col("s")).alias("d"),
        )
    )
    den = dd.agg(F.sum(F.col("d") * F.col("d")).alias("den"))
    ks = spark.range(1, _ACF_MAXLAG + 1).select(F.col("id").alias("lag"))
    a = dd.select(F.col("t").alias("ta"), F.col("d").alias("da"))
    b = dd.select(F.col("t").alias("tb"), F.col("d").alias("db"))
    return (
        ks.crossJoin(a)
        .join(b, F.col("tb") == F.col("ta") + F.col("lag"))
        .crossJoin(F.broadcast(den))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            dround(
                F.sum(F.col("da") * F.col("db")).cast("double")
                / F.first(F.col("den")).cast("double"),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


# --------------------------------------------------------------------------
# Cohort lifetime-value matrix (orders by first-purchase quarter)
# --------------------------------------------------------------------------

_LTV_SQL = """
    WITH first AS (
      SELECT o_custkey, MIN(o_orderdate) AS f FROM orders GROUP BY 1
    )
    SELECT date_trunc('quarter', first.f) AS cohort_q,
           CAST((year(o.o_orderdate) - year(first.f)) * 4
                + (quarter(o.o_orderdate) - quarter(first.f)) AS BIGINT)
             AS offset_q,
           COUNT(DISTINCT o.o_custkey) AS n_cust,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN first ON first.o_custkey = o.o_custkey
    GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("agg_cohort_ltv", sql=_LTV_SQL)
def agg_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-purchase
    quarter, revenue accumulated by quarter offset since acquisition —
    the REVENUE companion to win_retention_cohort's activity counts
    (LTV curves, payback windows, cohort-quality drift all read off
    this matrix).

    Plan: first-purchase is one partial-aggregable groupBy on custkey;
    the fact re-joins it on the same key (co-partitioned shuffle — at
    100 TB both sides hash-partition on custkey and the join is local),
    then one groupBy over the bounded (quarter × offset) grid. Revenue
    stays exact integer cents (sum promoted internally; output cast
    documented at test scale)."""
    o = T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderdate",
        dround(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("f"))
    return (
        o.join(first, "o_custkey")
        .groupBy(
            F.date_trunc("quarter", "f").alias("cohort_q"),
            (
                (F.year("o_orderdate") - F.year("f")) * 4
                + (F.quarter("o_orderdate") - F.quarter("f"))
            )
            .cast("long")
            .alias("offset_q"),
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_cust"),
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
        .orderBy("cohort_q", "offset_q")
    )


# --------------------------------------------------------------------------
# Delta-method ratio-metric CI (revenue per order, by market segment)
# --------------------------------------------------------------------------

_RATIO_SQL = """
    WITH per AS (
      SELECT c.c_mktsegment, o.o_custkey,
             COUNT(*) AS ni,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS yi
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    st AS (
      SELECT c_mktsegment, COUNT(*) AS n,
             SUM(CAST(ni AS HUGEINT)) AS sn,
             SUM(CAST(yi AS HUGEINT)) AS sy,
             SUM(CAST(ni AS HUGEINT) * ni) AS snn,
             SUM(CAST(yi AS HUGEINT) * yi) AS syy,
             SUM(CAST(ni AS HUGEINT) * yi) AS syn
      FROM per GROUP BY 1
    )
    SELECT c_mktsegment, n AS n_cust,
           ROUND(CAST(sy AS DOUBLE) / CAST(sn AS DOUBLE) * 1e4) / 1e4
             AS ratio_cents,
           ROUND(SQRT((CAST(n * syy - sy * sy AS DOUBLE)
                       - 2.0 * (CAST(sy AS DOUBLE) / CAST(sn AS DOUBLE))
                         * CAST(n * syn - sy * sn AS DOUBLE)
                       + (CAST(sy AS DOUBLE) / CAST(sn AS DOUBLE))
                         * (CAST(sy AS DOUBLE) / CAST(sn AS DOUBLE))
                         * CAST(n * snn - sn * sn AS DOUBLE))
                      / (CAST(n - 1 AS DOUBLE) * CAST(sn * sn AS DOUBLE)))
                 * 1e4) / 1e4 AS se_cents
    FROM st ORDER BY c_mktsegment
"""


@register("agg_ratio_delta_ci", sql=_RATIO_SQL)
def agg_ratio_delta_ci(spark: SparkSession, sf: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (revenue per
    order, customer-clustered) per market segment — the estimator A/B
    experimentation actually needs when the randomization unit
    (customer) differs from the analysis unit (order): naive per-order
    variance understates; the delta method var(Ȳ/N̄) ≈
    (s²_Y − 2R·s_YN + R²·s²_N)/(n·μ_N²) accounts for clustering.
    Complements agg_ab_test_welch (mean metric) and
    agg_bootstrap_mean_ci (resampled CI).

    Exactness: every (co)moment is an exact integer sum
    (decimal/HUGEINT — Σy² exceeds int64 at sf0.1 already); the n-scaled
    clearing VY = n·Σy² − (Σy)² etc. avoids subtracting near-equal
    doubles; the double expression is written in the IDENTICAL
    association order in both engines so the one sqrt sees the same
    IEEE input. Plan: per-customer rollup co-partitions with the
    customer join on custkey; segment stats are cardinality-sized."""
    dec = "decimal(38,0)"
    per = (
        T(spark, sf, "orders")
        .select(
            "o_custkey",
            dround(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .join(
            T(spark, sf, "customer").select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.count("*").alias("ni"), F.sum("cents").alias("yi"))
    )
    st = per.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.col("ni").cast(dec)).alias("sn"),
        F.sum(F.col("yi").cast(dec)).alias("sy"),
        F.sum(F.col("ni").cast(dec) * F.col("ni")).alias("snn"),
        F.sum(F.col("yi").cast(dec) * F.col("yi")).alias("syy"),
        F.sum(F.col("ni").cast(dec) * F.col("yi")).alias("syn"),
    )
    n, sn, sy = F.col("n"), F.col("sn"), F.col("sy")
    r = sy.cast("double") / sn.cast("double")
    vy = (n * F.col("syy") - sy * sy).cast("double")
    cyn = (n * F.col("syn") - sy * sn).cast("double")
    vn = (n * F.col("snn") - sn * sn).cast("double")
    var = (vy - F.lit(2.0) * r * cyn + r * r * vn) / (
        (n - 1).cast("double") * (sn * sn).cast("double")
    )
    return st.select(
        "c_mktsegment",
        n.alias("n_cust"),
        dround(r, 4).alias("ratio_cents"),
        dround(F.sqrt(var), 4).alias("se_cents"),
    ).orderBy("c_mktsegment")


# --------------------------------------------------------------------------
# Personalized PageRank in exact integer arithmetic (affinity graph)
# --------------------------------------------------------------------------

_PPR_SCALE = 10**12
_PPR_SEED_MOD = 3
_PPR_ROUNDS = 3
_PPR_TOPN = 20


def _ppr_oracle_sql() -> str:
    from engine.analytics import AFFINITY_EDGES_CTE
    from engine.session import EVENTS_US_SQL

    def round_ctes(t: int) -> str:
        return f"""
    c{t} AS MATERIALIZED (
      SELECT ed.dst AS user_id, SUM(r.r // d.deg) AS c
      FROM edges ed
      JOIN deg d ON d.src = ed.src
      JOIN r{t - 1} r ON r.user_id = ed.src
      GROUP BY ed.dst
    ),
    r{t} AS MATERIALIZED (
      SELECT n.user_id,
             CASE WHEN n.user_id % {_PPR_SEED_MOD} = 0
                  THEN (15 * ({_PPR_SCALE} // ns.n)) // 100 ELSE 0 END
             + (85 * COALESCE(c.c, 0)) // 100 AS r
      FROM nodes n CROSS JOIN ns
      LEFT JOIN c{t} c ON c.user_id = n.user_id
    )"""

    rounds = ",".join(round_ctes(t) for t in range(1, _PPR_ROUNDS + 1))
    return f"""
    WITH e AS ({EVENTS_US_SQL}),
    {AFFINITY_EDGES_CTE.strip()},
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS user_id FROM edges),
    ns AS (SELECT COUNT(*) AS n FROM nodes
           WHERE user_id % {_PPR_SEED_MOD} = 0),
    r0 AS MATERIALIZED (
      SELECT n.user_id,
             CASE WHEN n.user_id % {_PPR_SEED_MOD} = 0
                  THEN {_PPR_SCALE} // ns.n ELSE 0 END AS r
      FROM nodes n CROSS JOIN ns
    ),
    {rounds}
    SELECT user_id, CAST(r AS BIGINT) AS rank_units
    FROM r{_PPR_ROUNDS}
    ORDER BY r DESC, user_id LIMIT {_PPR_TOPN}
"""


@register("graph_personalized_pagerank", sql=_ppr_oracle_sql)
def graph_personalized_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Personalized PageRank from a seed set (user_id % {_PPR_SEED_MOD}
    = 0) over the shared affinity graph — {_PPR_ROUNDS} damped rounds
    (d=0.85) where teleport mass returns to the SEEDS only: the
    recommendation/trust propagation primitive, next to the global
    graph_pagerank whose teleport is uniform.

    EXACT INTEGER fixpoint (unlike pagerank's float vector, which needs
    a materialized-artifact oracle): rank mass is 1e12 integer
    micro-units; per round each node ships r div deg along every edge
    (integer division — floor == truncate on the non-negative domain,
    so Spark `div` and DuckDB `//` agree) and damping is (85·c) div 100.
    Every intermediate is an exact integer, so {_PPR_ROUNDS} rounds
    unroll in pure SQL with no float-order hazard, value-checked
    end-to-end. Plan: per round ONE equi-join (ranks onto degree-
    annotated edges, both pre-partitioned on the user key) + ONE
    partial-aggregable sum by dst — the k-iteration join+agg shape that
    holds at 100 TB; the only driver scalar is the seed count."""
    from engine.analytics import materialize_affinity_edges

    edges = scratch_cache(materialize_affinity_edges(spark, sf))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = scratch_cache(edges.join(deg, "src"))
    nodes = scratch_cache(
        edges.select(F.col("src").alias("user_id")).distinct()
    )
    n_seeds = nodes.filter(F.col("user_id") % _PPR_SEED_MOD == 0).count()
    tele = _PPR_SCALE // n_seeds
    base = (15 * tele) // 100
    seed = F.col("user_id") % _PPR_SEED_MOD == 0
    r = nodes.withColumn(
        "r", F.when(seed, F.lit(tele)).otherwise(F.lit(0)).cast("long")
    )
    for _ in range(_PPR_ROUNDS):
        contrib = (
            edges_deg.join(r, edges_deg.src == r.user_id)
            .select(F.col("dst"), F.expr("r div deg").alias("m"))
            .groupBy("dst")
            .agg(F.sum("m").alias("c"))
        )
        r = (
            nodes.join(contrib, nodes.user_id == contrib.dst, "left")
            .select(
                "user_id",
                (
                    F.when(seed, F.lit(base)).otherwise(F.lit(0))
                    + F.expr("(85 * coalesce(c, 0L)) div 100")
                ).alias("r"),
            )
        )
    return (
        r.select("user_id", F.col("r").cast("long").alias("rank_units"))
        .orderBy(F.col("rank_units").desc(), "user_id")
        .limit(_PPR_TOPN)
    )


# --------------------------------------------------------------------------
# Bloom-prefilter semi-join with measured FP audit (lineitem x PROMO parts)
# --------------------------------------------------------------------------

_BPF_M = 16384
_BPF_K = 3

_BPF_SQL = f"""
    WITH members AS MATERIALIZED (
      SELECT p_partkey FROM part WHERE p_type = 'PROMO'
    ),
    js AS (SELECT UNNEST(GENERATE_SERIES(0, {_BPF_K - 1})) AS j),
    bits AS MATERIALIZED (
      SELECT DISTINCT
        (('0x' || substr(md5(js.j || ':' || CAST(p_partkey AS VARCHAR)),
                         1, 15))::BIGINT) % {_BPF_M} AS pos
      FROM members, js
    ),
    fact AS (
      SELECT l_partkey,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             (('0x' || substr(md5('0:' || CAST(l_partkey AS VARCHAR)),
                              1, 15))::BIGINT) % {_BPF_M} AS p0,
             (('0x' || substr(md5('1:' || CAST(l_partkey AS VARCHAR)),
                              1, 15))::BIGINT) % {_BPF_M} AS p1,
             (('0x' || substr(md5('2:' || CAST(l_partkey AS VARCHAR)),
                              1, 15))::BIGINT) % {_BPF_M} AS p2
      FROM lineitem
    ),
    verdicts AS (
      SELECT f.cents,
             b0.pos IS NOT NULL AND b1.pos IS NOT NULL
               AND b2.pos IS NOT NULL AS pass,
             m.p_partkey IS NOT NULL AS is_member
      FROM fact f
      LEFT JOIN bits b0 ON b0.pos = f.p0
      LEFT JOIN bits b1 ON b1.pos = f.p1
      LEFT JOIN bits b2 ON b2.pos = f.p2
      LEFT JOIN members m ON m.p_partkey = f.l_partkey
    )
    SELECT (SELECT COUNT(*) FROM members) AS n_members,
           (SELECT COUNT(*) FROM bits) AS n_bits_set,
           COUNT(*) AS n_fact,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           CAST(SUM(CASE WHEN pass AND NOT is_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pass,
           CAST(SUM(CASE WHEN is_member THEN cents ELSE 0 END) AS BIGINT)
             AS true_revenue_cents,
           ROUND(CAST(SUM(CASE WHEN pass AND NOT is_member THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END)
                        AS DOUBLE) * 1e6) / 1e6 AS fp_rate
    FROM verdicts
"""


def _bpf_pos(j: int, key) -> F.Column:
    from engine.session import hash60

    return hash60(F.concat(F.lit(f"{j}:"), key.cast("string"))) % _BPF_M


@register("join_bloom_prefilter_semi", sql=_BPF_SQL)
def join_bloom_prefilter_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit Bloom-prefilter semi-join: the fact (lineitem) is
    pre-screened against an m={_BPF_M}/k={_BPF_K} Bloom filter built
    from the PROMO part keys BEFORE the exact join, and the query
    reports the economics — rows passed, true matches, false passes,
    measured FP rate, and the revenue the true matches carry. This is
    the hand-rolled twin of join_runtime_bloom_filter (where the engine
    injects the filter invisibly) and the JOIN-side application of
    agg_bloom_filter_report's standalone filter.

    Plan shape is the point: the filter is a ≤m-row position relation
    that BROADCASTS; each probe is {_BPF_K} broadcast-hash lookups
    added to the scan — the fact never shuffles, never explodes, and
    the final verdict aggregation is partial-aggregable, so at 100 TB
    the pre-screen costs one map-side pass (vs shipping the full fact
    to an exact join). No false negatives is structural (member ⇒ all
    k positions set), asserted in tests. Portable-hash family: under
    SPARK_GRAFT_FAST_HASH the positions differ (bench-only mode);
    oracle comparisons always run portable."""
    members = (
        T(spark, sf, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    bits = scratch_cache(
        members.select(
            F.explode(
                F.array(*[_bpf_pos(j, F.col("p_partkey")) for j in range(_BPF_K)])
            ).alias("pos")
        ).distinct()
    )
    fact = T(spark, sf, "lineitem").select(
        "l_partkey",
        dround(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        *[_bpf_pos(j, F.col("l_partkey")).alias(f"p{j}") for j in range(_BPF_K)],
    )
    v = fact
    for j in range(_BPF_K):
        v = v.join(
            F.broadcast(bits.select(F.col("pos").alias(f"pos{j}"))),
            F.col(f"p{j}") == F.col(f"pos{j}"),
            "left",
        )
    v = v.join(
        F.broadcast(members.withColumn("is_m", F.lit(True))),
        v.l_partkey == members.p_partkey,
        "left",
    ).select(
        "cents",
        (
            F.col("pos0").isNotNull()
            & F.col("pos1").isNotNull()
            & F.col("pos2").isNotNull()
        ).alias("pass"),
        F.coalesce("is_m", F.lit(False)).alias("is_member"),
    )
    fp = F.sum(F.when(F.col("pass") & ~F.col("is_member"), 1).otherwise(0))
    nonm = F.sum(F.when(~F.col("is_member"), 1).otherwise(0))
    agg = v.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).cast("long").alias("n_pass"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_true"),
        fp.cast("long").alias("n_false_pass"),
        F.sum(F.when(F.col("is_member"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("true_revenue_cents"),
        dround(fp.cast("double") / nonm.cast("double"), 6).alias("fp_rate"),
    )
    return (
        agg.crossJoin(members.agg(F.count(F.lit(1)).alias("n_members")))
        .crossJoin(bits.agg(F.count(F.lit(1)).alias("n_bits_set")))
        .select(
            "n_members",
            "n_bits_set",
            "n_fact",
            "n_pass",
            "n_true",
            "n_false_pass",
            "true_revenue_cents",
            "fp_rate",
        )
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of two retrieval rankings (embeddings)
# --------------------------------------------------------------------------

_RRF_QMOD = 101
_RRF_QRES = 7
_RRF_N = 30
_RRF_K = 60
_RRF_OUT = 10

#: left-fold dot product with explicit 0.0 init — matches Spark's
#: F.aggregate(zip_with(...), 0.0, +) addition order term for term
_RRF_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64), "
    "i -> {a}[i] * {b}[i])), (x, y) -> x + y)"
)

_RRF_SQL = f"""
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
               WHERE vec_id % {_RRF_QMOD} = {_RRF_QRES}),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    scored AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(LIST_COSINE_SIMILARITY(q.e, c.e) * 1e6) / 1e6 AS cos,
             ROUND({_RRF_DOT.format(a="q.e", b="c.e")} * 1e6) / 1e6 AS dot
      FROM q, c WHERE q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot DESC, neighbor_id) AS rb
      FROM scored
    ),
    fused AS (
      SELECT query_id, neighbor_id,
             ROUND((CASE WHEN ra <= {_RRF_N}
                         THEN 1.0 / ({_RRF_K} + ra) ELSE 0.0 END
                    + CASE WHEN rb <= {_RRF_N}
                           THEN 1.0 / ({_RRF_K} + rb) ELSE 0.0 END) * 1e6)
               / 1e6 AS rrf
      FROM ranked WHERE ra <= {_RRF_N} OR rb <= {_RRF_N}
    )
    SELECT query_id, neighbor_id, rrf, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, neighbor_id) AS rnk
      FROM fused)
    WHERE rnk <= {_RRF_OUT} ORDER BY query_id, rnk
"""


@register("sim_rrf_fusion", sql=_RRF_SQL)
def sim_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings — cosine
    similarity and raw inner product — per query: RRF(d) =
    Σ_lists 1/({_RRF_K}+rank(d)), the standard hybrid-retrieval merge
    (dense + sparse, or multiple ANN probes) that needs only RANKS, so
    incomparable scores fuse without calibration. Top-{_RRF_N} from
    each list enters the fusion; top-{_RRF_OUT} fused per query is
    reported.

    Determinism: ranks are integers over 1e-6-rounded scores with id
    tie-breaks; each RRF term 1/(k+rank) is the same IEEE division in
    both engines and the two-term sum is written in the same order —
    the fused score is bit-identical before its own rounding. The
    oracle's dot product left-folds from an explicit 0.0 init, matching
    Spark's F.aggregate order term for term. Plan: broadcast query
    side, one corpus pass computing both scores, two WindowGroupLimit
    top-N windows per query — the exact-ANN baseline shape
    (sim_cosine_topk_exact); a production system would swap each list
    for its IVF/LSH approximation and fuse identically."""
    from engine.similarity import _as_double, _cosine

    emb = T(spark, sf, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") % _RRF_QMOD == _RRF_QRES).select(
            F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qe")
        )
    )
    from engine.session import parallelize_scan, scan_units

    # fan the per-pair cos/dot scoring out of the single-row-group
    # local scan (r14, guide §2.5); no-op at cluster scale
    c = parallelize_scan(emb, scan_units(sf, "embeddings")).select(
        F.col("vec_id").alias("neighbor_id"), _as_double("embedding").alias("ce")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dround(_cosine(F.col("qe"), F.col("ce")), 6).alias("cos"),
            dround(dot, 6).alias("dot"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    wb = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), "neighbor_id")
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    term = lambda r: F.when(  # noqa: E731 — mirrors the SQL CASE verbatim
        F.col(r) <= _RRF_N, F.lit(1.0) / (F.lit(_RRF_K) + F.col(r))
    ).otherwise(F.lit(0.0))
    fused = ranked.filter(
        (F.col("ra") <= _RRF_N) | (F.col("rb") <= _RRF_N)
    ).select(
        "query_id",
        "neighbor_id",
        dround(term("ra") + term("rb"), 6).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), "neighbor_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= _RRF_OUT)
        .orderBy("query_id", "rnk")
    )
