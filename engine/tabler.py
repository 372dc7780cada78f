"""Round-7 seventh wave (SURVEY.md §2 Table R): survival analysis
(Kaplan–Meier with administrative censoring), FIFO lot matching (the
tax-lot / inventory cost-basis join), multi-touch time-decay
attribution, and RFM customer segmentation — four classic analytics
workloads a warehouse user expects, re-expressed Spark-first.

Established contracts: every order-sensitive float accumulation is
quantized to integers BEFORE summation (ln factors, exp decay credits),
durations/quantities are exact integers end-to-end, rank-based scoring
rides the width_bucket offset-merge (no fact-scale single-reducer
window), and windows otherwise run only over bounded relations
(distinct event times, per-part lots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.canon import dround
from engine.registry import register
from engine.session import EVENTS_US_SQL, T, load_events, scratch_cache, tiny_df

# --------------------------------------------------------------------------
# Kaplan-Meier survival (time to first purchase, censored at 72 h)
# --------------------------------------------------------------------------

_KM_CUT_H = 72  # administrative censoring horizon (hours)
_KM_LNQ = 1_000_000  # ln-factor quantization (micro-units)

_KM_SQL = f"""
    WITH e AS ({EVENTS_US_SQL}),
    subj AS (
      SELECT user_id,
             epoch_us(MIN(ts) FILTER (WHERE event_type = 'purchase'))
               AS p_us,
             epoch_us(MIN(ts)) AS f_us
      FROM e GROUP BY user_id
    ),
    tim AS (
      SELECT user_id,
             CASE WHEN p_us IS NOT NULL
                       AND (p_us - f_us) // 3600000000 <= {_KM_CUT_H}
                  THEN (p_us - f_us) // 3600000000 ELSE {_KM_CUT_H} END
               AS t,
             (p_us IS NOT NULL
              AND (p_us - f_us) // 3600000000 <= {_KM_CUT_H}) AS ev
      FROM subj
    ),
    n_tot AS (SELECT COUNT(*) AS n FROM tim),
    dt AS MATERIALIZED (
      SELECT t, COUNT(*) FILTER (WHERE ev) AS d, COUNT(*) AS leaving
      FROM tim GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             n_tot.n - COALESCE(SUM(leaving) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS n_risk
      FROM dt, n_tot
    ),
    terms AS (
      SELECT t, d, n_risk,
             CASE WHEN d = n_risk THEN NULL
                  ELSE CAST(ROUND({_KM_LNQ} * LN(CAST(n_risk - d AS DOUBLE)
                                                 / CAST(n_risk AS DOUBLE)))
                       AS BIGINT) END AS lq,
             MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead
      FROM risk WHERE d > 0
    )
    SELECT t AS t_hours, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN dead = 1 THEN 0.0
                ELSE ROUND(EXP(SUM(lq) OVER (ORDER BY t
                                             ROWS UNBOUNDED PRECEDING)
                               / {_KM_LNQ}.0) * 1e6) / 1e6 END AS survival
    FROM terms ORDER BY t_hours
"""


@register("agg_survival_km", sql=_KM_SQL)
def agg_survival_km(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan–Meier survival estimator for time-to-first-purchase in
    HOURS since a user's first activity, administratively CENSORED at
    {_KM_CUT_H} h — the churn/conversion-latency curve (with its
    at-risk and event counts) that correctly uses users who haven't
    converted yet instead of dropping them, which a naive average
    cannot do.

    Determinism contract: durations are exact integer hours; each KM
    factor ln((n_i−d_i)/n_i) quantizes to 1e-6 integer units BEFORE the
    cumulative sum, so the order-sensitive accumulation is exact
    integer arithmetic and S(t)=exp(Σ/1e6) is the same IEEE double in
    both engines (one division, one ln, one exp per step — the
    agg_entropy log-ulp policy, hardened by quantizing pre-sum). A
    d=n_i step drives survival to exactly 0 thereafter (flagged, not
    ln(0)). Plan: one groupBy to subjects, one to the ≤{_KM_CUT_H}+1
    distinct event times; every window runs on that BOUNDED time
    relation."""
    ev = load_events(spark, sf)
    subj = ev.groupBy("user_id").agg(
        F.unix_micros(
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("p_us"),
        F.unix_micros(F.min("ts")).alias("f_us"),
    )
    t_ev = F.expr("(p_us - f_us) div 3600000000")
    is_ev = F.col("p_us").isNotNull() & (t_ev <= _KM_CUT_H)
    tim = subj.select(
        F.when(is_ev, t_ev).otherwise(F.lit(_KM_CUT_H)).alias("t"),
        is_ev.alias("ev"),
    )
    tim = scratch_cache(tim)
    n_tot = tim.count()  # one long on the driver
    dt = tim.groupBy("t").agg(
        F.count(F.when(F.col("ev"), 1)).alias("d"),
        F.count("*").alias("leaving"),
    )
    w = Window.orderBy("t")  # bounded: <= cut+1 distinct hours
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    risk = dt.select(
        "t",
        "d",
        (F.lit(n_tot) - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))).alias(
            "n_risk"
        ),
    ).filter(F.col("d") > 0)
    lq = F.when(F.col("d") == F.col("n_risk"), F.lit(None)).otherwise(
        dround(
            F.lit(_KM_LNQ)
            * F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            ),
            0,
        ).cast("long")
    )
    terms = risk.select(
        "t",
        "d",
        "n_risk",
        lq.alias("lq"),
        F.max(F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0))
        .over(w_cum)
        .alias("dead"),
    )
    surv = F.when(F.col("dead") == 1, F.lit(0.0)).otherwise(
        dround(F.exp(F.sum("lq").over(w_cum) / F.lit(float(_KM_LNQ))), 6)
    )
    return terms.select(
        F.col("t").alias("t_hours"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        surv.alias("survival"),
    ).orderBy("t_hours")


# --------------------------------------------------------------------------
# FIFO lot matching (cost-basis / inventory consumption join)
# --------------------------------------------------------------------------

_FIFO_SLICE = 97

_FIFO_SQL = f"""
    WITH li AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
             CAST(ROUND(l_quantity) AS BIGINT) AS qty
      FROM lineitem WHERE l_partkey % {_FIFO_SLICE} = 0
    ),
    sup AS (
      SELECT l_partkey, qty,
             COALESCE(SUM(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
      FROM li WHERE l_orderkey % 2 = 0
    ),
    dem AS (
      SELECT l_partkey, qty,
             COALESCE(SUM(qty) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
      FROM li WHERE l_orderkey % 2 = 1
    ),
    m AS (
      SELECT s.l_partkey,
             LEAST(s.lo + s.qty, d.lo + d.qty) - GREATEST(s.lo, d.lo)
               AS units
      FROM sup s JOIN dem d
        ON d.l_partkey = s.l_partkey
       AND s.lo < d.lo + d.qty AND d.lo < s.lo + s.qty
    ),
    tot AS (
      SELECT l.l_partkey,
             CAST(SUM(CASE WHEN l.l_orderkey % 2 = 0 THEN l.qty ELSE 0 END)
                  AS BIGINT) AS supply_units,
             CAST(SUM(CASE WHEN l.l_orderkey % 2 = 1 THEN l.qty ELSE 0 END)
                  AS BIGINT) AS demand_units
      FROM li l GROUP BY 1
    )
    SELECT t.l_partkey, t.supply_units, t.demand_units,
           COALESCE(mm.n_pairs, 0) AS n_pairs,
           COALESCE(mm.matched_units, 0) AS matched_units,
           GREATEST(t.demand_units - t.supply_units, 0)
             AS unmatched_demand_units
    FROM tot t LEFT JOIN (
      SELECT l_partkey, COUNT(*) AS n_pairs,
             CAST(SUM(units) AS BIGINT) AS matched_units
      FROM m GROUP BY 1) mm ON mm.l_partkey = t.l_partkey
    ORDER BY t.l_partkey
"""


@register("join_fifo_lot_match", sql=_FIFO_SQL)
def join_fifo_lot_match(spark: SparkSession, sf: str) -> DataFrame:
    """FIFO lot matching — the tax-lot / inventory cost-basis pairing:
    per part, supply lots (even order keys) are consumed by demand lots
    (odd order keys) strictly in ship-date order, and each (supply,
    demand) pair's matched units fall out of CUMULATIVE-INTERVAL
    OVERLAP: a lot occupies [cum_before, cum_before+qty) on its side's
    unit axis, and FIFO matching IS the intersection of the two
    interval sets. No loop, no per-unit explode — the sequential-
    sounding business rule is one keyed window per side plus one
    range-residual join.

    All quantities exact integers. Plan: per-part cumulative windows
    (keyed — allocation state never crosses parts, the
    win_allocation_waterfall contract), then an equi-join on partkey
    with the overlap inequality as residual — at 100 TB this is a hash
    join plus filter, skewed only if one part dominates (AQE). The
    deterministic part slice (% {_FIFO_SLICE}) keeps the audit output
    bounded; totals come from ONE shared scan of the slice."""
    li = scratch_cache(
        T(spark, sf, "lineitem")
        .filter(F.col("l_partkey") % _FIFO_SLICE == 0)
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            dround("l_quantity", 0).cast("long").alias("qty"),
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, -1)
    lo = F.coalesce(F.sum("qty").over(w), F.lit(0))

    def side(parity: int) -> DataFrame:
        return (
            li.filter(F.col("l_orderkey") % 2 == parity)
            .withColumn("lo", lo)
            .select("l_partkey", "qty", "lo")
        )

    sup = side(0).select(
        F.col("l_partkey").alias("pk"),
        F.col("lo").alias("s_lo"),
        (F.col("lo") + F.col("qty")).alias("s_hi"),
    )
    dem = side(1).select(
        F.col("l_partkey").alias("pk2"),
        F.col("lo").alias("d_lo"),
        (F.col("lo") + F.col("qty")).alias("d_hi"),
    )
    m = (
        sup.join(
            dem,
            (F.col("pk") == F.col("pk2"))
            & (F.col("s_lo") < F.col("d_hi"))
            & (F.col("d_lo") < F.col("s_hi")),
        )
        .select(
            "pk",
            (
                F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")
            ).alias("units"),
        )
        .groupBy("pk")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("units").alias("matched_units"),
        )
    )
    tot = li.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("l_orderkey") % 2 == 0, F.col("qty")).otherwise(0)).alias(
            "supply_units"
        ),
        F.sum(F.when(F.col("l_orderkey") % 2 == 1, F.col("qty")).otherwise(0)).alias(
            "demand_units"
        ),
    )
    return (
        tot.join(m, tot.l_partkey == m.pk, "left")
        .select(
            "l_partkey",
            "supply_units",
            "demand_units",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("matched_units", F.lit(0)).alias("matched_units"),
            F.greatest(
                F.col("demand_units") - F.col("supply_units"), F.lit(0)
            ).alias("unmatched_demand_units"),
        )
        .orderBy("l_partkey")
    )


# --------------------------------------------------------------------------
# Multi-touch time-decay attribution (events)
# --------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000
_ATTR_TAU_US = 24 * 3600 * 1_000_000
_ATTR_CQ = 1_000_000_000  # credit quantization (nano-units)

_ATTR_SQL = f"""
    WITH e AS ({EVENTS_US_SQL}),
    conv AS (
      SELECT event_id AS conv_id, user_id, epoch_us(ts) AS c_us
      FROM e WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us
      FROM e WHERE event_type <> 'purchase'
    ),
    pairs AS MATERIALIZED (
      SELECT c.conv_id, t.event_type,
             CAST(ROUND({_ATTR_CQ} * EXP(-(c.c_us - t.t_us)
                                         / {_ATTR_TAU_US}.0)) AS BIGINT)
               AS cq
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.t_us < c.c_us AND t.t_us >= c.c_us - {_ATTR_WINDOW_US}
    ),
    tot AS (
      SELECT conv_id, SUM(cq) AS s FROM pairs GROUP BY conv_id
    ),
    shares AS (
      SELECT p.event_type,
             CAST(ROUND(1e6 * CAST(p.cq AS DOUBLE) / CAST(t.s AS DOUBLE))
                  AS BIGINT) AS share_q
      FROM pairs p JOIN tot t ON t.conv_id = p.conv_id
    )
    SELECT event_type, COUNT(*) AS n_touches,
           ROUND(CAST(SUM(share_q) AS DOUBLE) / 1e6 * 1e4) / 1e4
             AS attributed_conversions
    FROM shares GROUP BY event_type ORDER BY event_type
"""


@register("win_time_decay_attribution", sql=_ATTR_SQL)
def win_time_decay_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-touch TIME-DECAY attribution: every purchase distributes
    one unit of conversion credit across the user's non-purchase
    touches in the prior 7 days, weighted exp(−Δt/τ), τ = 24 h — the
    standard middle ground between win_last_touch_attribution (all
    credit to one touch) and linear multi-touch (no recency signal).
    Output: credit captured per channel (event type).

    Determinism ladder: each decay weight quantizes to 1e-9 integer
    units (one exp per pair — identical IEEE input since Δt is an exact
    integer µs); per-conversion totals are exact integer sums; each
    share is ONE division of two exact integers, quantized to 1e-6
    before the per-channel sum — no order-sensitive float accumulation
    anywhere. Plan: conversions ⋈ touches is an equi-join on user_id
    with the 7-day band as residual (the stream-stream-join batch
    shape); everything after is partial-aggregable."""
    ev = load_events(spark, sf)
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        "event_type",
        F.unix_micros("ts").alias("t_us"),
    )
    cq = dround(
        F.lit(_ATTR_CQ)
        * F.exp(-(F.col("c_us") - F.col("t_us")) / F.lit(float(_ATTR_TAU_US))),
        0,
    ).cast("long")
    pairs = scratch_cache(
        conv.join(
            touch,
            (F.col("t_user") == F.col("c_user"))
            & (F.col("t_us") < F.col("c_us"))
            & (F.col("t_us") >= F.col("c_us") - _ATTR_WINDOW_US),
        ).select("conv_id", "event_type", cq.alias("cq"))
    )
    tot = pairs.groupBy("conv_id").agg(F.sum("cq").alias("s"))
    share_q = dround(
        F.lit(1e6) * F.col("cq").cast("double") / F.col("s").cast("double"), 0
    ).cast("long")
    return (
        pairs.join(tot, "conv_id")
        .select("event_type", share_q.alias("share_q"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_touches"),
            dround(F.sum("share_q").cast("double") / 1e6, 4).alias(
                "attributed_conversions"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (orders)
# --------------------------------------------------------------------------

_RFM_B = 5

_RFM_SQL = f"""
    WITH per AS (
      SELECT o_custkey,
             COUNT(*) AS f,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS m,
             MAX(o_orderdate) AS last_d
      FROM orders GROUP BY 1
    ),
    mx AS (SELECT MAX(last_d) AS mx FROM per),
    base AS (
      SELECT o_custkey, f, m,
             date_diff('day', last_d, mx.mx) AS r
      FROM per, mx
    ),
    rk AS (
      SELECT o_custkey, f, m, r,
             ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS rr,
             ROW_NUMBER() OVER (ORDER BY f, o_custkey) AS rf,
             ROW_NUMBER() OVER (ORDER BY m, o_custkey) AS rm,
             COUNT(*) OVER () AS n
      FROM base
    ),
    scored AS (
      SELECT m,
             {_RFM_B} - CAST((rr - 1) * {_RFM_B} // n AS BIGINT) AS r_score,
             CAST((rf - 1) * {_RFM_B} // n AS BIGINT) + 1 AS f_score,
             CAST((rm - 1) * {_RFM_B} // n AS BIGINT) + 1 AS m_score
      FROM rk
    )
    SELECT r_score, f_score, m_score, COUNT(*) AS n_cust,
           ROUND(CAST(SUM(CAST(m AS HUGEINT)) AS DOUBLE) / COUNT(*) * 1e2)
             / 1e2 AS avg_monetary_cents
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


@register("agg_rfm_segmentation", sql=_RFM_SQL)
def agg_rfm_segmentation(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per customer
    Recency (days since last order), Frequency (orders) and Monetary
    (exact cents) each score into {_RFM_B} exact-rank quintiles
    (recent/frequent/high-spend = 5), and the output is the populated
    (R,F,M) cell matrix with sizes and average spend — the direct input
    to lifecycle campaigns, next to agg_cohort_ltv's time axis.

    The oracle is the PLAIN single-window ROW_NUMBER formulation; the
    engine computes the identical ranks WITHOUT a single-reducer sort
    via the width_bucket offset-merge (engine.tableo._ranked, the
    feat_quantile_bin contract) — three rank builds on the
    customer-level relation, each exchanging only bucket counts.
    Scores are exact integer rank arithmetic (rank−1)·B div n; ties
    break on custkey in both engines."""
    from engine.tableo import _ranked

    per = scratch_cache(
        T(spark, sf, "orders")
        .select(
            "o_custkey",
            dround(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            "o_orderdate",
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("f"),
            F.sum("cents").alias("m"),
            F.max("o_orderdate").alias("last_d"),
        )
    )
    mx = per.agg(F.max("last_d").alias("mx"))
    base = scratch_cache(
        per.crossJoin(F.broadcast(mx)).select(
            "o_custkey",
            "f",
            "m",
            F.datediff("mx", "last_d").cast("long").alias("r"),
        )
    )
    # ONE aggregate supplies n plus all three rank domains' min/max —
    # previously a count() action plus three per-_ranked probe actions
    # over the same cached relation (guide §1: four jobs become one)
    pr = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("r").alias("rlo"),
        F.max("r").alias("rhi"),
        F.min("f").alias("flo"),
        F.max("f").alias("fhi"),
        F.min("m").alias("mlo"),
        F.max("m").alias("mhi"),
    ).first()
    n = pr["n"]
    # ONE exploded aggregate supplies all three dimensions' bucket
    # histograms — previously each _ranked ran its own bucket-count
    # collect over the same cached relation (guide §1: three count
    # jobs become one; the bucket expressions are the exact
    # width_bucket forms _ranked would derive from these bounds)
    from engine.tableo import _TS_BUCKETS

    def _wb(col: str, lo, hi):
        return F.width_bucket(
            F.col(col).cast("double"),
            F.lit(float(lo)),
            F.lit(float(hi) + 1.0),
            _TS_BUCKETS,
        )

    bkr = _wb("r", pr["rlo"], pr["rhi"])
    bkf = _wb("f", pr["flo"], pr["fhi"])
    bkm = _wb("m", pr["mlo"], pr["mhi"])
    cnt: dict[int, dict] = {1: {}, 2: {}, 3: {}}
    for row in (
        base.select(
            F.explode(
                F.array(
                    F.struct(F.lit(1).alias("d"), bkr.alias("bk")),
                    F.struct(F.lit(2).alias("d"), bkf.alias("bk")),
                    F.struct(F.lit(3).alias("d"), bkm.alias("bk")),
                )
            ).alias("x")
        )
        .select("x.d", "x.bk")
        .groupBy("d", "bk")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        cnt[row["d"]][row["bk"]] = row["c"]
    rr = _ranked(base, "r", ["o_custkey"], "rr", bucket_of=bkr, counts=cnt[1])
    rf = _ranked(
        base.select("o_custkey", "f"),
        "f",
        ["o_custkey"],
        "rf",
        bucket_of=bkf,
        counts=cnt[2],
    ).select("o_custkey", "rf")
    rm = _ranked(
        base.select("o_custkey", "m"),
        "m",
        ["o_custkey"],
        "rm",
        bucket_of=bkm,
        counts=cnt[3],
    ).select(F.col("o_custkey").alias("ck2"), "rm")
    dec = "decimal(38,0)"
    scored = (
        rr.join(rf, "o_custkey")
        .join(rm, F.col("o_custkey") == F.col("ck2"))
        .select(
            "m",
            (
                F.lit(_RFM_B)
                - F.expr(f"(rr - 1) * {_RFM_B} div {max(int(n), 1)}")
            )
            .cast("long")
            .alias("r_score"),
            (F.expr(f"(rf - 1) * {_RFM_B} div {max(int(n), 1)}") + 1)
            .cast("long")
            .alias("f_score"),
            (F.expr(f"(rm - 1) * {_RFM_B} div {max(int(n), 1)}") + 1)
            .cast("long")
            .alias("m_score"),
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_cust"),
            dround(
                F.sum(F.col("m").cast(dec)).cast("double") / F.count("*"), 2
            ).alias("avg_monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------------------------------------------------
# Markov (data-driven) attribution: removal effects on the journey chain
# --------------------------------------------------------------------------

_MA_M = 10**12  # mass micro-units
_MA_K = 20  # absorption iterations (paths beyond K touches truncated)

#: journey-transition CTEs shared by the oracle (expects `e` bound):
#: per user, the touch prefix strictly before the first purchase row
#: (by (ts, event_id) order) feeds START→…→CONV/NULL transitions;
#: CONV/NULL self-loop so ONE update rule drives the whole chain.
_MA_TRANS_CTE = """
    rk AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS r
      FROM e
    ),
    pf AS (
      SELECT user_id, MIN(r) AS pr FROM rk
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
      SELECT rk.user_id, rk.event_type AS ch, rk.r, pf.pr
      FROM rk LEFT JOIN pf ON pf.user_id = rk.user_id
      WHERE rk.event_type <> 'purchase'
        AND (pf.pr IS NULL OR rk.r < pf.pr)
    ),
    seq AS (
      SELECT user_id, ch, pr,
             LAG(ch) OVER (PARTITION BY user_id ORDER BY r) AS prev,
             LEAD(ch) OVER (PARTITION BY user_id ORDER BY r) AS nxt
      FROM touches
    ),
    raw AS (
      SELECT CASE WHEN prev IS NULL THEN 'START' ELSE prev END AS cur,
             ch AS nxt
      FROM seq WHERE prev IS NULL
      UNION ALL
      SELECT ch, nxt FROM seq WHERE nxt IS NOT NULL
      UNION ALL
      SELECT ch, CASE WHEN pr IS NOT NULL THEN 'CONV' ELSE 'NULL' END
      FROM seq WHERE nxt IS NULL
      UNION ALL
      SELECT 'START', 'CONV'
      FROM pf WHERE user_id NOT IN (SELECT DISTINCT user_id FROM touches)
    ),
    tr0 AS (SELECT cur, nxt, COUNT(*) AS n FROM raw GROUP BY cur, nxt),
    tr AS (
      SELECT * FROM tr0
      UNION ALL SELECT 'CONV', 'CONV', 1
      UNION ALL SELECT 'NULL', 'NULL', 1
    )
"""


def _ma_chain_sql(tag: str, removed: str | None) -> str:
    """K unrolled integer-mass steps over the (possibly channel-removed)
    transition relation; returns CTE text ending in p_{tag}."""
    if removed is None:
        t = f"t_{tag} AS (SELECT cur, nxt, n FROM tr)"
    else:
        t = f"""t_{tag} AS (
      SELECT cur, CASE WHEN nxt = '{removed}' THEN 'NULL' ELSE nxt END AS nxt,
             SUM(n) AS n
      FROM tr WHERE cur <> '{removed}' GROUP BY 1, 2
    )"""
    o = (
        f"o_{tag} AS (SELECT cur, SUM(n) AS o FROM t_{tag} GROUP BY cur)"
    )
    steps = [
        f"v_{tag}_0 AS (SELECT 'START' AS s, CAST({_MA_M} AS HUGEINT) AS m)"
    ]
    for k in range(1, _MA_K + 1):
        steps.append(
            f"""v_{tag}_{k} AS MATERIALIZED (
      SELECT t.nxt AS s, SUM((v.m * t.n) // o.o) AS m
      FROM v_{tag}_{k - 1} v
      JOIN t_{tag} t ON t.cur = v.s
      JOIN o_{tag} o ON o.cur = v.s
      GROUP BY t.nxt
    )"""
        )
    p = (
        f"p_{tag} AS (SELECT COALESCE(MAX(m), 0) AS p FROM v_{tag}_{_MA_K}"
        f" WHERE s = 'CONV')"
    )
    return ",\n    ".join([t, o] + steps + [p])


def _ma_oracle_sql() -> str:
    from engine.session import EVENTS_US_SQL

    channels = ["click", "error", "signup", "view"]
    chains = [_ma_chain_sql("base", None)] + [
        _ma_chain_sql(c, c) for c in channels
    ]
    effects = " + ".join(
        f"GREATEST(pb.p - (SELECT p FROM p_{c}), 0)" for c in channels
    )
    rows = "\n      UNION ALL ".join(
        f"""SELECT '{c}' AS channel,
             CAST(pb.p AS BIGINT) AS p_base_units,
             CAST((SELECT p FROM p_{c}) AS BIGINT) AS p_removed_units,
             CAST(GREATEST(pb.p - (SELECT p FROM p_{c}), 0) AS BIGINT)
               AS effect_units,
             ROUND(CAST(GREATEST(pb.p - (SELECT p FROM p_{c}), 0) AS DOUBLE)
                   / CAST(NULLIF({effects}, 0) AS DOUBLE) * 1e6) / 1e6
               AS share
      FROM p_base pb"""
        for c in channels
    )
    return f"""
    WITH e AS ({EVENTS_US_SQL}),
    {_MA_TRANS_CTE.strip()},
    {",".join(chains)}
    SELECT * FROM (
      {rows}
    ) ORDER BY channel
"""


@register("agg_markov_attribution", sql=_ma_oracle_sql)
def agg_markov_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Markov (data-driven) attribution — the removal-effect model that
    completes the attribution trilogy (win_last_touch_attribution,
    win_time_decay_attribution): build the first-order journey chain
    START → touches → CONV/NULL from every user's pre-purchase touch
    prefix, compute the START→CONV absorption probability, then re-run
    the chain with each channel REMOVED (its inbound mass diverted to
    NULL); a channel's credit share is its normalized conversion drop —
    channels that merely appear in journeys earn nothing unless paths
    STOP converting without them.

    EXACT INTEGER absorption (the graph_personalized_pagerank
    contract): 1e12 mass micro-units, per step v'(s') =
    Σ_s (v(s)·c(s,s')) div o(s) with CONV/NULL self-looping so one
    update rule drives the whole chain; {_MA_K} truncated steps
    (journeys beyond {_MA_K} touches are dropped mass, disclosed), so
    every probability is a deterministic integer in BOTH engines and
    the oracle unrolls the five chains as MATERIALIZED CTEs. Plan:
    ONE lead/lag window pass behind a user_id shuffle builds the
    transition counts (bounded: (channels+3)² cells); the chains
    themselves run on the DRIVER over that channel-sized matrix — the
    k-means bounded-state rule, NOT a data-sized collect."""
    ev = load_events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rk = ev.select("user_id", "event_type", F.row_number().over(w).alias("r"))
    pf = (
        rk.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("r").alias("pr"))
    )
    touches = (
        rk.filter(F.col("event_type") != "purchase")
        .join(pf, "user_id", "left")
        .filter(F.col("pr").isNull() | (F.col("r") < F.col("pr")))
        .select("user_id", F.col("event_type").alias("ch"), "r", "pr")
    )
    wt = Window.partitionBy("user_id").orderBy("r")
    seq = touches.select(
        "user_id",
        "ch",
        "pr",
        F.lag("ch").over(wt).alias("prev"),
        F.lead("ch").over(wt).alias("nxt"),
    )
    starts = seq.filter(F.col("prev").isNull()).select(
        F.lit("START").alias("cur"), F.col("ch").alias("nxt")
    )
    mids = seq.filter(F.col("nxt").isNotNull()).select(
        F.col("ch").alias("cur"), F.col("nxt")
    )
    ends = seq.filter(F.col("nxt").isNull()).select(
        F.col("ch").alias("cur"),
        F.when(F.col("pr").isNotNull(), F.lit("CONV"))
        .otherwise(F.lit("NULL"))
        .alias("nxt"),
    )
    no_touch = pf.join(
        touches.select("user_id").distinct(), "user_id", "left_anti"
    ).select(F.lit("START").alias("cur"), F.lit("CONV").alias("nxt"))
    tr = (
        starts.unionByName(mids)
        .unionByName(ends)
        .unionByName(no_touch)
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("n"))
    )
    # bounded driver state: (channels+3)^2 transition cells
    cells = [(r["cur"], r["nxt"], int(r["n"])) for r in tr.collect()]
    cells += [("CONV", "CONV", 1), ("NULL", "NULL", 1)]

    def absorb(cells_: list) -> int:
        out: dict = {}
        byc: dict = {}
        for cur, nxt, n in cells_:
            out[cur] = out.get(cur, 0) + n
            byc.setdefault(cur, []).append((nxt, n))
        v = {"START": _MA_M}
        for _ in range(_MA_K):
            nv: dict = {}
            for s, m in v.items():
                for nxt, n in byc.get(s, ()):
                    nv[nxt] = nv.get(nxt, 0) + (m * n) // out[s]
            v = nv
        return v.get("CONV", 0)

    def removed(ch: str) -> list:
        agg: dict = {}
        for cur, nxt, n in cells:
            if cur == ch:
                continue
            key = (cur, "NULL" if nxt == ch else nxt)
            agg[key] = agg.get(key, 0) + n
        return [(c, x, n) for (c, x), n in agg.items()]

    p_base = absorb(cells)
    channels = ["click", "error", "signup", "view"]
    per = {c: absorb(removed(c)) for c in channels}
    effects = {c: max(p_base - per[c], 0) for c in channels}
    tot = sum(effects.values())

    def share_q(e: int) -> float:
        # mirror the oracle bit-for-bit: same double op order
        # (e/tot)*1e6, then HALF-AWAY rounding (DuckDB ROUND) — Python
        # round() is half-to-even and an exact .5 tie is reachable
        # (integer-ratio micro-units, e.g. effect=1, total=80000 → 12.5)
        from engine.canon import round_half_away

        return float(round_half_away(e / tot * 1e6)) / 1e6

    rows = [
        (
            c,
            p_base,
            per[c],
            effects[c],
            share_q(effects[c]) if tot else None,
        )
        for c in sorted(channels)
    ]
    return tiny_df(
        spark,
        rows,
        "channel string, p_base_units long, p_removed_units long,"
        " effect_units long, share double",
    )
