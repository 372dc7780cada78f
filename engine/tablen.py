"""Round-7 third wave (SURVEY.md §2 Table N): the feature-engineering
family a training pipeline runs between raw tables and model input —
standard/min-max scaling, equi-depth quantile binning, smoothed target
encoding, hashing-trick featurization — plus a cross-table fuzzy join
(blocked edit-distance record linkage).

Reference parity: the reference (coursework fork, SURVEY.md §0) has no
analog; these extend the engine along the training-data platform axis
with the repo's established contracts: exact integer statistics
(decimal-promoted where long would overflow at 100 TB), one-division
rational arithmetic before any double rounds, the width_bucket
offset-merge instead of single-reducer global windows, and the portable
md5 hash family the oracle rebuilds bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.canon import dround
from engine.registry import register
from engine.session import T

# --------------------------------------------------------------------------
# Standard + min-max scaling (lineitem prices, grouped by returnflag)
# --------------------------------------------------------------------------

#: deterministic audit slice: every lineitem of orders whose key is a
#: multiple of this prime gets its scaled values value-checked
_SCALE_SAMPLE = 997

_SCALE_SQL = f"""
    WITH c AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    st AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(cents AS HUGEINT)) AS s,
             SUM(CAST(cents * cents AS HUGEINT)) AS ssq,
             MIN(cents) AS lo, MAX(cents) AS hi
      FROM c GROUP BY 1
    )
    SELECT c.l_orderkey, c.l_linenumber, c.l_returnflag,
           st.n AS n_grp,
           ROUND(CAST(CAST(c.cents AS HUGEINT) * st.n - st.s AS DOUBLE)
                 / SQRT(CAST(st.n * st.ssq - st.s * st.s AS DOUBLE))
                 * 1e6) / 1e6 AS z,
           ROUND(CAST(c.cents - st.lo AS DOUBLE)
                 / CAST(st.hi - st.lo AS DOUBLE) * 1e6) / 1e6 AS mm
    FROM c JOIN st ON st.l_returnflag = c.l_returnflag
    WHERE c.l_orderkey % {_SCALE_SAMPLE} = 0
    ORDER BY c.l_orderkey, c.l_linenumber
"""


@register("feat_standard_scale", sql=_SCALE_SQL)
def feat_standard_scale(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group standard (z-score) AND min-max scaling of lineitem
    prices — the feature-normalization pass every tabular training run
    applies before gradient descent sees a column.

    Exactness contract: group statistics are EXACT INTEGER sums over
    cents (sum-of-squares promoted to decimal(38,0) — Σcents² exceeds
    int64 already at sf0.1, let alone 100 TB), and
    z = (x·n − Σx)/√(n·Σx² − (Σx)²) is algebraically identical to
    (x−μ)/σ but every operand entering the double domain is an exact
    integer — the one sqrt and one division land on the same IEEE
    doubles in both engines, then quantize to 1e-6.

    Plan shape: one partial-aggregable full scan builds the per-group
    stats (3 rows), which BROADCAST back onto the deterministically
    sampled audit slice (stats from the FULL data, outputs for
    key % {_SCALE_SAMPLE} == 0) — no window, no second shuffle; at
    100 TB the only cross-stage traffic is 3 stat rows."""
    c = T(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        dround(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    dec = "decimal(38,0)"
    st = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast(dec)).alias("ssq"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    )
    num = (F.col("n").cast(dec) * F.col("ssq") - F.col("s") * F.col("s")).cast(
        "double"
    )
    z = dround(
        (F.col("cents").cast(dec) * F.col("n") - F.col("s")).cast("double")
        / F.sqrt(num),
        6,
    )
    mm = dround(
        (F.col("cents") - F.col("lo")).cast("double")
        / (F.col("hi") - F.col("lo")).cast("double"),
        6,
    )
    return (
        c.filter(F.col("l_orderkey") % _SCALE_SAMPLE == 0)
        .join(F.broadcast(st), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("n").alias("n_grp"),
            z.alias("z"),
            mm.alias("mm"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# Equi-depth quantile binning (orders totalprice, B bins)
# --------------------------------------------------------------------------

_BIN_B = 10
_BIN_BUCKETS = 32

_BIN_SQL = f"""
    WITH c AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rnk,
             COUNT(*) OVER () AS n
      FROM c
    )
    SELECT CAST(((rnk - 1) * {_BIN_B}) // n AS BIGINT) AS bin,
           COUNT(*) AS n_rows,
           MIN(cents) AS lo_cents, MAX(cents) AS hi_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM r GROUP BY 1 ORDER BY 1
"""


@register("feat_quantile_bin", sql=_BIN_SQL)
def feat_quantile_bin(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth quantile binning (discretization) of order totals
    into {_BIN_B} bins — the feature-bucketing / histogram-equalization
    transform, defined by exact global rank arithmetic
    bin = (rank−1)·B div n on the total order (cents, o_orderkey).

    The oracle is the PLAIN single-window ROW_NUMBER formulation; the
    engine computes the identical rank WITHOUT a single-reducer sort
    via the width_bucket offset-merge (pipeline_curriculum_schedule
    contract): {_BIN_BUCKETS} value-range buckets over cents, per-bucket
    row_number windows hash-parallel, bucket counts round-trip as
    broadcast cumulative offsets — equal cents always share a bucket and
    the in-bucket order is total, so the decomposition reproduces the
    oracle rank bit-for-bit. At 100 TB the only single-point traffic is
    {_BIN_BUCKETS} longs; bin boundaries stay exact longs end-to-end."""
    c = T(spark, sf, "orders").select(
        "o_orderkey",
        dround(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    lo, hi, n = c.agg(F.min("cents"), F.max("cents"), F.count("*")).first()
    bucketed = c.withColumn(
        "bucket",
        F.width_bucket(
            F.col("cents").cast("double"),
            F.lit(float(lo)),
            F.lit(float(hi) + 1.0),
            _BIN_BUCKETS,
        ),
    )
    counts = {
        r["bucket"]: r["cnt"]
        for r in bucketed.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w_local = Window.partitionBy("bucket").orderBy("cents", "o_orderkey")
    rank = F.row_number().over(w_local) + off_map[F.col("bucket")]
    return (
        bucketed.withColumn("rnk", rank)
        .select(
            "cents",
            F.expr(f"(cast(rnk as bigint) - 1) * {_BIN_B} div {max(int(n), 1)}")
            .alias("bin"),
        )
        .groupBy(F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Smoothed target encoding (orders priority -> mean totalprice cents)
# --------------------------------------------------------------------------

_TE_M = 100  # smoothing pseudo-count

_TE_SQL = f"""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    per AS (
      SELECT o_orderpriority, COUNT(*) AS n,
             SUM(CAST(cents AS HUGEINT)) AS s
      FROM c GROUP BY 1
    ),
    g AS (SELECT SUM(n) AS gn, SUM(s) AS gs FROM per)
    SELECT o_orderpriority, n AS n_rows,
           ROUND(CAST(s AS DOUBLE) / n * 1e4) / 1e4 AS raw_mean_cents,
           ROUND(CAST(s * gn + {_TE_M} * gs AS DOUBLE)
                 / CAST(gn * (n + {_TE_M}) AS DOUBLE) * 1e4) / 1e4
             AS smoothed_cents
    FROM per, g ORDER BY o_orderpriority
"""


@register("feat_target_encode", sql=_TE_SQL)
def feat_target_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Smoothed (shrinkage) target encoding of a categorical feature:
    enc(cat) = (Σ_cat y + m·μ_global)/(n_cat + m) with pseudo-count
    m={_TE_M} — the mean-encoding transform that replaces high-
    cardinality categoricals before gradient-boosted / linear models,
    with the global prior damping small categories.

    The shrinkage formula is evaluated as ONE division of two EXACT
    integers — (s·N + m·S)/(N·(n+m)) — never as nested double
    divisions whose association order could differ across engines;
    sums ride decimal(38,0)/HUGEINT so the identity survives 100 TB
    row counts. Plan: one partial-aggregable groupBy to category rows,
    a single-row global roll-up joined back by broadcast — category
    cardinality traffic only."""
    c = T(spark, sf, "orders").select(
        "o_orderpriority",
        dround(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    dec = "decimal(38,0)"
    per = c.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("s"),
    )
    glob = per.agg(
        F.sum("n").alias("gn"), F.sum("s").alias("gs")
    )
    smoothed = dround(
        (F.col("s") * F.col("gn") + F.lit(_TE_M) * F.col("gs")).cast("double")
        / (F.col("gn").cast(dec) * (F.col("n") + _TE_M)).cast("double"),
        4,
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "o_orderpriority",
            F.col("n").alias("n_rows"),
            dround(F.col("s").cast("double") / F.col("n"), 4).alias(
                "raw_mean_cents"
            ),
            smoothed.alias("smoothed_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Hashing-trick featurization (documents tokens -> 2^14 buckets)
# --------------------------------------------------------------------------

_HT_DIM = 1 << 14
_HT_TOPN = 20

_HT_SQL = f"""
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    tt AS (
      SELECT ('0x' || substr(md5('ht:' || tok), 1, 15))::BIGINT % {_HT_DIM}
               AS bucket,
             tok, COUNT(*) AS n
      FROM toks WHERE tok != '' GROUP BY 1, 2
    )
    SELECT bucket, total_count, n_tokens, top_token, top_token_count
    FROM (
      SELECT bucket,
             CAST(SUM(n) OVER (PARTITION BY bucket) AS BIGINT)
               AS total_count,
             COUNT(*) OVER (PARTITION BY bucket) AS n_tokens,
             tok AS top_token, n AS top_token_count,
             ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY n DESC, tok) AS rn
      FROM tt)
    WHERE rn = 1
    ORDER BY total_count DESC, bucket LIMIT {_HT_TOPN}
"""


@register("feat_hashing_trick", sql=_HT_SQL)
def feat_hashing_trick(spark: SparkSession, sf: str) -> DataFrame:
    """Hashing-trick featurization (the fixed-dimension bag-of-words
    featurizer): token → bucket md5('ht:'‖tok) mod {_HT_DIM}, the
    vocabulary-free encoding that needs no dictionary build, no OOV
    path, and no driver state at 100 TB. Output is the top-{_HT_TOPN}
    feature buckets with their collision audit (distinct tokens per
    bucket + the dominant token) — the report that tells you whether
    the chosen dimensionality is colliding away signal.

    Portable-hash family (engine.session.hash60): under
    SPARK_GRAFT_FAST_HASH the bucketing differs (bench-only mode);
    oracle comparisons always run portable. Plan: explode →
    (bucket, token) partial-aggregable counts → per-bucket roll-up +
    dominant-token window over bucket-sized groups → global top-N via
    TakeOrdered; nothing single-partition before the final
    {_HT_TOPN}-row take."""
    from engine.session import hash60

    toks = (
        T(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tt = (
        toks.withColumn(
            "bucket", hash60(F.concat(F.lit("ht:"), F.col("tok"))) % _HT_DIM
        )
        .groupBy("bucket", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_b = Window.partitionBy("bucket")
    w_top = Window.partitionBy("bucket").orderBy(F.col("n").desc(), "tok")
    return (
        tt.select(
            "bucket",
            F.sum("n").over(w_b).alias("total_count"),
            F.count(F.lit(1)).over(w_b).alias("n_tokens"),
            F.col("tok").alias("top_token"),
            F.col("n").alias("top_token_count"),
            F.row_number().over(w_top).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy(F.col("total_count").desc(), "bucket")
        .limit(_HT_TOPN)
    )


# --------------------------------------------------------------------------
# Blocked fuzzy join (dirty-feed record linkage over document titles)
# --------------------------------------------------------------------------

_FZ_TITLE = 40  # catalog key length
_FZ_PRE = 8  # blocking key lengths (prefix / suffix)

_FZ_SQL = f"""
    WITH cat AS (
      SELECT doc_id, substr(text, 1, {_FZ_TITLE}) AS title
      FROM documents WHERE length(text) >= {_FZ_TITLE}
    ),
    dirty AS (
      SELECT doc_id AS dd,
             title AS src_title,
             substr(title, 1, CAST(doc_id % {_FZ_TITLE} AS INT))
               || substr(title, CAST(doc_id % {_FZ_TITLE} AS INT) + 2)
               AS dname
      FROM cat
    ),
    cand AS (
      SELECT DISTINCT d.dd, d.src_title, d.dname, c.doc_id AS cd, c.title
      FROM dirty d JOIN cat c
        ON substr(c.title, 1, {_FZ_PRE}) = substr(d.dname, 1, {_FZ_PRE})
      UNION
      SELECT DISTINCT d.dd, d.src_title, d.dname, c.doc_id AS cd, c.title
      FROM dirty d JOIN cat c
        ON substr(c.title, {_FZ_TITLE} - {_FZ_PRE} + 1, {_FZ_PRE})
           = substr(d.dname, {_FZ_TITLE} - {_FZ_PRE}, {_FZ_PRE})
    ),
    scored AS (
      SELECT dd, src_title, cd, title,
             levenshtein(title, dname) AS dist
      FROM cand
    ),
    best AS (
      SELECT dd, src_title, cd, title, dist,
             ROW_NUMBER() OVER (PARTITION BY dd ORDER BY dist, cd) AS rn
      FROM scored WHERE dist <= 2
    )
    SELECT COALESCE(b.dist, -1) AS dist,
           COUNT(*) AS n_matched,
           COUNT(*) FILTER (WHERE b.title = d.src_title) AS n_correct
    FROM dirty d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      ON b.dd = d.dd
    GROUP BY 1 ORDER BY 1
"""


@register("join_fuzzy_blocked", sql=_FZ_SQL)
def join_fuzzy_blocked(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked fuzzy join (record linkage): a dirty feed — each
    {_FZ_TITLE}-char document title with ONE character deleted at a
    key-determined position — is matched back to the clean catalog by
    edit distance, without ever scoring the n² pair space.

    Blocking is the two-sided prefix/suffix union that PROVABLY covers
    a single deletion: a deletion at position k leaves the first
    {_FZ_PRE} chars intact when k > {_FZ_PRE} (prefix block) and the
    last {_FZ_PRE} chars intact when k ≤ {_FZ_TITLE}-{_FZ_PRE}
    (suffix block) — every true pair lands in at least one equi-join,
    so recall of the generator is structural, not probabilistic.
    Levenshtein (Spark's bounded 3-arg form ≡ oracle's unbounded +
    filter) runs only inside blocks; best match per dirty row breaks
    ties (dist, candidate id); `n_correct` audits matches against the
    known source TITLE (not id — planted duplicate docs share titles).
    At 100 TB block sizes track title-prefix frequency — the natural-
    key skew is the disclosed cost driver, and the dist = -1 row counts
    feed rows no block recalled."""
    cat = (
        T(spark, sf, "documents")
        .filter(F.length("text") >= _FZ_TITLE)
        .select("doc_id", F.substring("text", 1, _FZ_TITLE).alias("title"))
    )
    dirty = cat.select(
        F.col("doc_id").alias("dd"),
        F.col("title").alias("src_title"),
        F.expr(
            f"concat(substr(title, 1, cast(doc_id % {_FZ_TITLE} as int)),"
            f" substr(title, cast(doc_id % {_FZ_TITLE} as int) + 2))"
        ).alias("dname"),
    )
    c_pre = cat.select(
        F.col("doc_id").alias("cd"),
        "title",
        F.substring("title", 1, _FZ_PRE).alias("bk"),
    )
    d_pre = dirty.withColumn("bk", F.substring("dname", 1, _FZ_PRE))
    c_suf = cat.select(
        F.col("doc_id").alias("cd"),
        "title",
        F.substring("title", _FZ_TITLE - _FZ_PRE + 1, _FZ_PRE).alias("bk"),
    )
    d_suf = dirty.withColumn(
        "bk", F.substring("dname", _FZ_TITLE - _FZ_PRE, _FZ_PRE)
    )
    cols = ["dd", "src_title", "dname", "cd", "title"]
    cand = (
        d_pre.join(c_pre, "bk").select(*cols)
        .unionByName(d_suf.join(c_suf, "bk").select(*cols))
        .distinct()
    )
    scored = cand.select(
        "dd", "src_title", "cd", "title",
        F.levenshtein(F.col("title"), F.col("dname"), 3).alias("dist"),
    ).filter((F.col("dist") >= 0) & (F.col("dist") <= 2))
    w = Window.partitionBy("dd").orderBy("dist", "cd")
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("dd", F.col("title").alias("m_title"), "dist")
    )
    return (
        dirty.join(best, "dd", "left")
        .groupBy(F.coalesce(F.col("dist"), F.lit(-1)).alias("dist"))
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.count(
                F.when(F.col("m_title") == F.col("src_title"), 1)
            ).alias("n_correct"),
        )
        .orderBy("dist")
    )
