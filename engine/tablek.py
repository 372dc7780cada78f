"""Round-6 wave (SURVEY.md §2 Table K): link-analysis ranking (HITS),
behavioral path mining, preference-pair construction, curriculum
scheduling, privacy-thresholded n-gram release, signed-random-projection
embedding sketches, zone-map skip analytics, stratified k-fold
assignment, and rolling correlation — the remaining operator families a
100 TB training-data platform runs that Tables A–J didn't yet cover.

Scale design notes (100 TB posture):
- HITS: each half-iteration is ONE equi-join (scores ⋈ weighted edges
  on the node id) + one sum aggregate — the Bellman-Ford/LPA shape; no
  normalization step because the un-normalized integer recurrence has
  the same argsort (what top-k needs) and stays exact in any engine.
- funnel paths: sessionize with windows (no self-join), build step
  triples with two LEADs inside the session partition, then ONE count
  aggregate — linear in events, shuffle keyed by user.
- preference pairs / curriculum / k-fold: pure window + aggregate
  pipelines over per-document expressions; everything partial-aggregable
  or partitioned by the natural key (group / stratum).
- SRP sketch: the 64×64 sign matrix is a BROADCAST relation and the
  bit computation is matrix-product-as-join-and-agg (explode dims →
  join signs → sum per (vec, bit)) — embeddings never pairwise-join
  until the 64-bit signatures exist, and the final hamming top-k joins
  every signature against ONE broadcast query signature. Embedding
  components are quantized to exact integers (round(v·1e6)) before any
  sum, so the sign of every projection is bit-identical in any engine
  and the oracle value-checks the whole sketch, not a recall bound.
- zone-map skip stats: operates on the per-file min/max relation (the
  manifest scale, not the data scale) after one aggregate builds it.
- DP-style release: count → perturb (deterministic discrete noise from
  the portable hash family — stands in for the two-sided geometric of a
  production release; the pipeline SHAPE is what's exercised) →
  threshold → release. One groupBy + one filter, fully integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.canon import dround
from engine.registry import register
from engine.session import EVENTS_US_SQL, T, scratch_cache

# --------------------------------------------------------------------------
# HITS hubs & authorities (2 unrolled iterations, integer-exact)
# --------------------------------------------------------------------------

_HITS_TOP = 20


def _hits_oracle_sql() -> str:
    from engine.analytics import AFFINITY_EDGES_CTE

    return (
        f"""
    WITH e AS ({EVENTS_US_SQL}),
"""
        + AFFINITY_EDGES_CTE
        + f""",
    w AS (SELECT src, dst, COUNT(*) AS wt FROM edges GROUP BY src, dst),
    a1 AS (SELECT dst AS v, SUM(wt) AS s FROM w GROUP BY dst),
    h1 AS (
      SELECT w.src AS v, SUM(w.wt * a1.s) AS s
      FROM w JOIN a1 ON a1.v = w.dst GROUP BY w.src
    ),
    a2 AS (
      SELECT w.dst AS v, SUM(w.wt * h1.s) AS s
      FROM w JOIN h1 ON h1.v = w.src GROUP BY w.dst
    ),
    h2 AS (
      SELECT w.src AS v, SUM(w.wt * a2.s) AS s
      FROM w JOIN a2 ON a2.v = w.dst GROUP BY w.src
    )
    SELECT * FROM (
      SELECT 'hub' AS role, v AS user_id, CAST(s AS BIGINT) AS score
      FROM h2 ORDER BY s DESC, v LIMIT {_HITS_TOP})
    UNION ALL
    SELECT * FROM (
      SELECT 'authority' AS role, v AS user_id, CAST(s AS BIGINT) AS score
      FROM a2 ORDER BY s DESC, v LIMIT {_HITS_TOP})
"""
    )


@register("graph_hits_topk", sql=_hits_oracle_sql)
def graph_hits_topk(spark: SparkSession, sf: str) -> DataFrame:
    """HITS hubs-and-authorities over the shared affinity multigraph
    collapsed to weighted edges: two full unnormalized iterations
    (h0 = 1 → a1 = weighted in-degree → h1 → a2 → h2), then the top-20
    of each role. Dropping the usual L2 normalization keeps every score
    an exact integer with the SAME ranking (normalization is a positive
    scalar per iteration), so the oracle replays the identical
    recurrence and value-checks the scores, not just the order.

    Scale shape: each half-iteration is one equi-join of the score
    vector against the weighted edge list (both hashed on the node id)
    + one sum aggregate — the Bellman-Ford/LPA pattern; top-20 is a
    TakeOrdered, never a global sort."""
    from engine.analytics import materialize_affinity_edges

    edges = materialize_affinity_edges(spark, sf)
    w = scratch_cache(
        edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("wt"))
    )

    def push(scores: DataFrame, src_to_dst: bool) -> DataFrame:
        """One half-iteration: scores on the FROM side pushed across
        edges and summed on the TO side."""
        frm, to = ("src", "dst") if src_to_dst else ("dst", "src")
        return (
            w.join(scores, w[frm] == scores["v"])
            .groupBy(F.col(to).alias("vv"))
            .agg(F.sum(F.col("wt") * F.col("s")).alias("s"))
            .select(F.col("vv").alias("v"), "s")
        )

    h0 = w.select(F.col("src").alias("v")).distinct().select(
        "v", F.lit(1).cast("long").alias("s")
    )
    a1 = push(h0, True)
    h1 = push(a1, False)
    # a2 feeds BOTH h2's push and the authority top-20 — cached, or the
    # whole a1→h1→a2 join chain executes twice under the final union
    # (plan audit r13: 42 Exchanges, zero ReusedExchange)
    a2 = scratch_cache(push(h1, True))
    h2 = push(a2, False)

    def top(scores: DataFrame, role: str) -> DataFrame:
        return (
            scores.orderBy(F.col("s").desc(), "v")
            .limit(_HITS_TOP)
            .select(
                F.lit(role).alias("role"),
                F.col("v").alias("user_id"),
                F.col("s").cast("long").alias("score"),
            )
        )

    return top(h2, "hub").unionAll(top(a2, "authority"))


# --------------------------------------------------------------------------
# Funnel path mining: top 3-step event-type paths within sessions
# --------------------------------------------------------------------------

_PATHS_TOP = 20

_FUNNEL_PATHS_SQL = f"""
    WITH e AS ({EVENTS_US_SQL}),
    flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    ),
    steps AS (
      SELECT event_type AS step1,
             LEAD(event_type, 1) OVER w2 AS step2,
             LEAD(event_type, 2) OVER w2 AS step3
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, session_no ORDER BY ts, event_id)
    )
    SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM steps WHERE step3 IS NOT NULL
    GROUP BY step1, step2, step3
    ORDER BY cnt DESC, step1, step2, step3
    LIMIT {_PATHS_TOP}
"""


@register("agg_funnel_paths_top", sql=_FUNNEL_PATHS_SQL)
def agg_funnel_paths_top(spark: SparkSession, sf: str) -> DataFrame:
    """Top 3-step event-type paths inside 30-minute-gap sessions — the
    behavioral path-mining primitive behind funnel dashboards ("what do
    users actually do in a visit"). Sessionize with the gaps-and-islands
    window (no self-join), build consecutive triples with two LEADs in
    the (user, session) partition, then one count aggregate. Linear in
    events, shuffle keyed by user_id; the top-20 is a TakeOrdered."""
    ev = T(spark, sf, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (
                F.col("ts").cast("long") - F.lag("ts").over(wu).cast("long")
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_s").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    steps = sess.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(ws).alias("step2"),
        F.lead("event_type", 2).over(ws).alias("step3"),
    )
    return (
        steps.filter(F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "step1", "step2", "step3")
        .limit(_PATHS_TOP)
    )


# --------------------------------------------------------------------------
# Preference-pair construction (chosen/rejected per group by quality)
# --------------------------------------------------------------------------

#: tiny fixed stopword list shared verbatim by both engines
_STOPS = ("the", "of", "and", "to", "in", "a", "is", "for", "on", "that")
_STOPS_SQL = ", ".join(f"'{s}'" for s in _STOPS)
_PAIR_MIN_MARGIN = 0.01

_PREF_PAIRS_SQL = f"""
    WITH scored AS (
      SELECT doc_id, source, lang,
             ROUND(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                                   w -> w IN ({_STOPS_SQL})))
                   * 1e4 / LEN(STRING_SPLIT(text, ' '))) / 1e4 AS score
      FROM documents
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY score DESC, doc_id) AS rb,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY score ASC, doc_id DESC) AS rw,
             COUNT(*) OVER (PARTITION BY source, lang) AS n
      FROM scored
    ),
    best AS (SELECT source, lang, doc_id, score, n FROM ranked WHERE rb = 1),
    worst AS (SELECT source, lang, doc_id, score FROM ranked WHERE rw = 1)
    SELECT b.source, b.lang,
           b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
           b.score AS chosen_score, w.score AS rejected_score,
           ROUND((b.score - w.score) * 1e4) / 1e4 AS margin
    FROM best b JOIN worst w ON b.source = w.source AND b.lang = w.lang
    WHERE b.n >= 2 AND b.score - w.score >= {_PAIR_MIN_MARGIN}
    ORDER BY b.source, b.lang
"""


@register("pipeline_preference_pairs", sql=_PREF_PAIRS_SQL)
def pipeline_preference_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Preference-pair construction — the RLHF/DPO data-prep primitive:
    within each (source, lang) group, pair the highest-scoring document
    (chosen) with the lowest (rejected), keeping pairs whose quality
    margin clears a floor. Quality here is stopword density (a standard
    fluency proxy, computed identically in both engines); ties break on
    doc_id in OPPOSITE directions for the two ranks so a constant-score
    group picks two DISTINCT docs before the margin filter drops it.
    One pass of per-row expressions + two window ranks per group — no
    join until the two single-row-per-group sides meet."""
    d = T(spark, sf, "documents")
    toks = F.split(F.lower("text"), " ")
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*_STOPS)))
    scored = d.select(
        "doc_id",
        "source",
        "lang",
        dround(
            stop_hits * 1e4 / F.size(F.split("text", " ")), 0
        ).alias("score_1e4"),
    ).select(
        "doc_id", "source", "lang", (F.col("score_1e4") / 1e4).alias("score")
    )
    g = Window.partitionBy("source", "lang")
    ranked = scored.select(
        "*",
        F.row_number()
        .over(g.orderBy(F.col("score").desc(), "doc_id"))
        .alias("rb"),
        F.row_number()
        .over(g.orderBy(F.col("score").asc(), F.col("doc_id").desc()))
        .alias("rw"),
        F.count(F.lit(1)).over(g).alias("n"),
    )
    best = ranked.filter(F.col("rb") == 1).select(
        "source", "lang",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
        "n",
    )
    worst = ranked.filter(F.col("rw") == 1).select(
        "source", "lang",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
    )
    return (
        best.join(worst, ["source", "lang"])
        .filter(
            (F.col("n") >= 2)
            & (
                F.col("chosen_score") - F.col("rejected_score")
                >= _PAIR_MIN_MARGIN
            )
        )
        .select(
            "source",
            "lang",
            "chosen_doc",
            "rejected_doc",
            "chosen_score",
            "rejected_score",
            dround(F.col("chosen_score") - F.col("rejected_score"), 4).alias(
                "margin"
            ),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# Curriculum scheduling: difficulty quartiles with per-phase budgets
# --------------------------------------------------------------------------

_CURRICULUM_SQL = """
    WITH d AS (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) AS words,
             ROUND((n_chars - LEN(STRING_SPLIT(text, ' ')) + 1) * 1e4
                   / LEN(STRING_SPLIT(text, ' '))) / 1e4 AS difficulty
      FROM documents
    ),
    phased AS (
      SELECT *, NTILE(4) OVER (ORDER BY difficulty, doc_id) AS phase
      FROM d
    )
    SELECT CAST(phase AS INT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(difficulty) * 1e4) / 1e4 AS avg_difficulty,
           CAST(SUM(words) AS BIGINT) AS token_budget
    FROM phased GROUP BY phase ORDER BY phase
"""


@register("pipeline_curriculum_schedule", sql=_CURRICULUM_SQL)
def pipeline_curriculum_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum scheduling: rank documents by a difficulty proxy
    (mean word length — chars net of separators over words), cut into 4
    NTILE phases (easy → hard), and report each phase's size, mean
    difficulty, and token budget — the schedule a curriculum-learning
    run feeds its sampler.

    NTILE semantics WITHOUT the unpartitioned window (VERDICT r6 fix;
    the ``win_pctrank_bucketed`` offset-merge recipe, relational.py):
    width_bucket(difficulty) range-buckets the corpus, per-bucket
    row_number windows run hash-partition parallel, the 32 bucket
    counts round-trip through the driver as cumulative offsets, and
    phase = the exact NTILE(4) arithmetic on global rank (first n%4
    tiles get ceil(n/4) rows). Equal difficulties always share a
    bucket and the within-bucket order (difficulty, doc_id) is total,
    so the decomposition reproduces the oracle's single-window NTILE
    bit-for-bit — the oracle SQL is the PLAIN global NTILE, proving
    equivalence rather than assuming it. At 100 TB the only
    single-point traffic is 32 longs."""
    d = T(spark, sf, "documents")
    words = F.size(F.split("text", " "))
    scored = d.select(
        "doc_id",
        words.alias("words"),
        dround((F.col("n_chars") - words + 1) * 1e4 / words, 0).alias("d4"),
    ).select("doc_id", "words", (F.col("d4") / 1e4).alias("difficulty"))
    lo, hi, n = scored.agg(
        F.min("difficulty"), F.max("difficulty"), F.count("*")
    ).first()
    n_buckets = 32
    bucketed = scored.withColumn(
        "bucket",
        F.width_bucket(
            F.col("difficulty"), F.lit(float(lo)), F.lit(float(hi) + 1.0), n_buckets
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
    w_local = Window.partitionBy("bucket").orderBy("difficulty", "doc_id")
    rank = F.row_number().over(w_local) + off_map[F.col("bucket")]
    base, rem = divmod(int(n), 4)
    if base == 0:  # fewer rows than tiles: rank IS the tile
        phase = rank
    else:
        cut = rem * (base + 1)
        phase = F.when(rank <= cut, F.ceil(rank / F.lit(base + 1.0))).otherwise(
            rem + F.ceil((rank - cut) / F.lit(float(base)))
        )
    phased = bucketed.withColumn("phase", phase)
    return (
        phased.groupBy(F.col("phase").cast("int").alias("phase"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            dround(F.avg("difficulty"), 4).alias("avg_difficulty"),
            F.sum("words").cast("long").alias("token_budget"),
        )
        .orderBy("phase")
    )


# --------------------------------------------------------------------------
# Privacy-thresholded bigram release (count -> perturb -> threshold)
# --------------------------------------------------------------------------

_DP_NOISE_SPAN = 9  # discrete uniform in [-4, +4]
_DP_THRESHOLD = 12

_DP_BIGRAM_SQL = f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS t FROM documents
    ),
    bigrams AS (
      SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM toks
    ),
    counted AS (SELECT bg, COUNT(*) AS cnt FROM bigrams GROUP BY bg),
    noised AS (
      SELECT bg, cnt,
             cnt + (('0x' || substr(md5('dp:' || bg), 1, 15))::BIGINT
                    % {_DP_NOISE_SPAN}) - {(_DP_NOISE_SPAN - 1) // 2}
               AS noisy_count
      FROM counted
    )
    SELECT bg AS bigram, CAST(noisy_count AS BIGINT) AS noisy_count
    FROM noised WHERE noisy_count >= {_DP_THRESHOLD}
    ORDER BY noisy_count DESC, bigram
"""


@register("text_dp_bigram_release", sql=_DP_BIGRAM_SQL)
def text_dp_bigram_release(spark: SparkSession, sf: str) -> DataFrame:
    """Privacy-thresholded n-gram release — the shape of a DP vocabulary
    /n-gram publication: count bigrams across the corpus, PERTURB each
    count, THRESHOLD, and release only the noisy counts (true counts
    never leave). Noise here is deterministic discrete uniform from the
    portable hash family (so the release is value-checkable end-to-end);
    a production release swaps in two-sided geometric noise drawn from
    real randomness — one expression, same plan. Count is one
    partial-aggregable groupBy over exploded bigrams; the threshold
    prunes the long tail before any sort."""
    from engine.session import parallelize_scan, scan_units

    d = parallelize_scan(T(spark, sf, "documents"), scan_units(sf, "documents"))
    toks = F.split(F.lower("text"), " ")
    bigrams = d.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            )
        ).alias("bg")
    )
    counted = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    noise = (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("dp:"), F.col("bg"))), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(_DP_NOISE_SPAN),
        )
        - (_DP_NOISE_SPAN - 1) // 2
    )
    return (
        counted.select(
            F.col("bg").alias("bigram"),
            (F.col("cnt") + noise).cast("long").alias("noisy_count"),
        )
        .filter(F.col("noisy_count") >= _DP_THRESHOLD)
        .orderBy(F.col("noisy_count").desc(), "bigram")
    )


# --------------------------------------------------------------------------
# Signed-random-projection (SRP) embedding sketch + hamming top-k
# --------------------------------------------------------------------------

_SRP_BITS = 64
_SRP_DIMS = 64
_SRP_TOP = 10

_SRP_SQL = f"""
    WITH q AS (
      SELECT vec_id, g.i AS d,
             CAST(FLOOR(embedding[g.i + 1] * 1e6 + 0.5) AS BIGINT) AS qv
      FROM embeddings, UNNEST(GENERATE_SERIES(0, {_SRP_DIMS - 1})) AS g(i)
    ),
    signs AS (
      SELECT b.b, d.d,
             CASE WHEN ('0x' || substr(md5('srp:' || CAST(b.b AS VARCHAR)
                        || ':' || CAST(d.d AS VARCHAR)), 1, 1))::INT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM UNNEST(GENERATE_SERIES(0, {_SRP_BITS - 1})) AS b(b),
           UNNEST(GENERATE_SERIES(0, {_SRP_DIMS - 1})) AS d(d)
    ),
    bits AS (
      SELECT q.vec_id, s.b,
             CASE WHEN SUM(s.sgn * q.qv) > 0 THEN 1 ELSE 0 END AS bit
      FROM q JOIN signs s ON s.d = q.d
      GROUP BY q.vec_id, s.b
    ),
    qid AS (SELECT MIN(vec_id) AS qv FROM embeddings),
    qbits AS (
      SELECT b, bit FROM bits, qid WHERE vec_id = qid.qv
    )
    SELECT c.vec_id,
           CAST(SUM(CASE WHEN c.bit <> qb.bit THEN 1 ELSE 0 END) AS INT)
             AS hamming
    FROM bits c JOIN qbits qb ON qb.b = c.b, qid
    WHERE c.vec_id <> qid.qv
    GROUP BY c.vec_id
    ORDER BY hamming, c.vec_id
    LIMIT {_SRP_TOP}
"""


@register("sim_srp_hamming_topk", sql=_SRP_SQL)
def sim_srp_hamming_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Signed-random-projection cosine sketch: each embedding collapses
    to a {_SRP_BITS}-bit signature (bit b = sign of the projection onto
    a ±1 vector derived from the portable hash family), and the top-10
    nearest neighbors of the first vector are ranked by signature
    hamming distance — the classic SimHash-for-vectors construction
    (Charikar), where hamming distance estimates angular distance.

    Exactness: components quantize to integers (round(v·1e6)) BEFORE
    the projection sums, so every sign is exact in any engine and the
    oracle value-checks the full sketch. Scale shape: the projection is
    matrix-product-as-join — explode (vec, dim) rows, join the 64×64
    BROADCAST sign matrix on dim, one partial-aggregable sum per
    (vec, bit); signatures then meet ONE broadcast query signature.
    Pairwise vec×vec never happens."""
    from engine.session import parallelize_scan, scan_units

    emb = T(spark, sf, "embeddings")
    # fan the 64x explode + sign join + (vec, bit) partial agg out of
    # the single-row-group local scan (r14, guide §2.5); no-op at
    # cluster scale — downstream sums are exact integers, order-free
    q = parallelize_scan(emb, scan_units(sf, "embeddings")).select(
        "vec_id", F.posexplode("embedding").alias("d", "v")
    ).select(
        "vec_id",
        "d",
        F.floor(F.col("v").cast("double") * 1e6 + 0.5).cast("long").alias("qv"),
    )
    signs = (
        spark.range(_SRP_BITS)
        .select(F.col("id").alias("b"))
        .crossJoin(
            F.broadcast(spark.range(_SRP_DIMS).select(F.col("id").alias("d")))
        )
        .select(
            "b",
            "d",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit("srp"),
                                F.col("b").cast("string"),
                                F.col("d").cast("string"),
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("int")
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("sgn"),
        )
    )
    bits = (
        q.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "b")
        .agg(
            F.when(F.sum(F.col("sgn") * F.col("qv")) > 0, 1)
            .otherwise(0)
            .alias("bit")
        )
    )
    bits = scratch_cache(bits)
    qid = emb.agg(F.min("vec_id").alias("qv"))
    qbits = (
        bits.join(F.broadcast(qid), bits["vec_id"] == F.col("qv"))
        .select(F.col("b").alias("qb_b"), F.col("bit").alias("qbit"))
    )
    return (
        bits.join(F.broadcast(qbits), bits["b"] == F.col("qb_b"))
        .join(F.broadcast(qid), bits["vec_id"] != F.col("qv"))
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.when(F.col("bit") != F.col("qbit"), 1).otherwise(0)
            )
            .cast("int")
            .alias("hamming")
        )
        .orderBy("hamming", "vec_id")
        .limit(_SRP_TOP)
    )


# --------------------------------------------------------------------------
# Zone-map skip statistics (manifest-scale scan planning analytics)
# --------------------------------------------------------------------------

_SKIP_FILE_ROWS = 4000
_SKIP_LO = "1995-01-01"
_SKIP_HI = "1995-03-31"

_FILE_SKIP_SQL = f"""
    WITH filed AS (
      SELECT l_orderkey // {_SKIP_FILE_ROWS} AS file_id, l_shipdate
      FROM lineitem
    ),
    zones AS (
      SELECT file_id, MIN(l_shipdate) AS zmin, MAX(l_shipdate) AS zmax,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN l_shipdate BETWEEN DATE '{_SKIP_LO}'
                       AND DATE '{_SKIP_HI}' THEN 1 ELSE 0 END) AS n_match
      FROM filed GROUP BY file_id
    ),
    flagged AS (
      SELECT *,
             CASE WHEN zmax < DATE '{_SKIP_LO}' OR zmin > DATE '{_SKIP_HI}'
                  THEN 1 ELSE 0 END AS skipped
      FROM zones
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(skipped) AS BIGINT) AS files_skipped,
           CAST(SUM(1 - skipped) AS BIGINT) AS files_scanned,
           CAST(SUM(CASE WHEN skipped = 0 THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matching,
           ROUND(SUM(skipped) * 1e4 / COUNT(*)) / 1e4 AS skip_ratio
    FROM flagged
"""


@register("scan_file_skip_stats", sql=_FILE_SKIP_SQL)
def scan_file_skip_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Zone-map (min/max) skip effectiveness for a date-range predicate
    — the scan-planning telemetry every lakehouse layout decision is
    graded by: bucket lineitem into synthetic files of {_SKIP_FILE_ROWS}
    orderkeys (orderkey order correlates with ship date, so zone maps
    are tight — the layout_zorder_cluster premise), build each file's
    min/max, and report how many files a [{_SKIP_LO}, {_SKIP_HI}]
    predicate skips outright plus the false-positive rows the survivors
    still scan. After the one aggregate that builds the zone relation,
    everything runs at MANIFEST scale (one row per file)."""
    li = T(spark, sf, "lineitem").select(
        (F.col("l_orderkey") / _SKIP_FILE_ROWS).cast("long").alias("file_id"),
        "l_shipdate",
    )
    lo, hi = F.lit(_SKIP_LO).cast("date"), F.lit(_SKIP_HI).cast("date")
    zones = li.groupBy("file_id").agg(
        F.min("l_shipdate").alias("zmin"),
        F.max("l_shipdate").alias("zmax"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("l_shipdate").between(lo, hi), 1).otherwise(0)
        ).alias("n_match"),
    )
    flagged = zones.withColumn(
        "skipped",
        F.when((F.col("zmax") < lo) | (F.col("zmin") > hi), 1).otherwise(0),
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("skipped").cast("long").alias("files_skipped"),
        F.sum(1 - F.col("skipped")).cast("long").alias("files_scanned"),
        F.sum(F.when(F.col("skipped") == 0, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matching"),
        dround(F.sum("skipped") * 1e4 / F.count(F.lit(1)), 0).alias("sr4"),
    ).select(
        "n_files",
        "files_skipped",
        "files_scanned",
        "rows_scanned",
        "rows_matching",
        (F.col("sr4") / 1e4).alias("skip_ratio"),
    )


# --------------------------------------------------------------------------
# Stratified k-fold assignment (deterministic, hash-balanced)
# --------------------------------------------------------------------------

_KFOLD = 5

_KFOLD_SQL = f"""
    WITH assigned AS (
      SELECT lang,
             ('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 15))
               ::BIGINT % {_KFOLD} AS fold
      FROM documents
    ),
    per AS (
      SELECT lang, fold, COUNT(*) AS n_docs FROM assigned GROUP BY lang, fold
    )
    SELECT lang, CAST(fold AS INT) AS fold, CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(SUM(n_docs) OVER (PARTITION BY lang) * 1e4 / {_KFOLD})
             / 1e4 AS expected,
           CAST(n_docs - MIN(n_docs) OVER (PARTITION BY lang) AS BIGINT)
             AS spread_from_min
    FROM per
    ORDER BY lang, fold
"""


@register("sample_kfold_stratified", sql=_KFOLD_SQL)
def sample_kfold_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified k-fold assignment: fold(doc) = portable
    hash of doc_id mod {_KFOLD}, reported per (lang, fold) with the
    stratum's expected per-fold size and each fold's spread above the
    stratum minimum — the split audit a training pipeline runs before
    trusting its eval folds. Hash-mod assignment is reproducible across
    engines AND across reruns on changed corpora (a doc keeps its fold
    when neighbors are added/removed — why production splits hash
    instead of shuffling). One groupBy + manifest-scale windows."""
    d = T(spark, sf, "documents")
    fold = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(_KFOLD),
    )
    per = (
        d.select("lang", fold.alias("fold"))
        .groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    wl = Window.partitionBy("lang")
    return per.select(
        "lang",
        F.col("fold").cast("int").alias("fold"),
        F.col("n_docs").cast("long").alias("n_docs"),
        (dround(F.sum("n_docs").over(wl) * 1e4 / _KFOLD, 0) / 1e4).alias(
            "expected"
        ),
        (F.col("n_docs") - F.min("n_docs").over(wl))
        .cast("long")
        .alias("spread_from_min"),
    ).orderBy("lang", "fold")


# --------------------------------------------------------------------------
# Rolling 24-hour correlation between hourly count and hourly value
# --------------------------------------------------------------------------

_CORR_WIN = 24

_ROLLING_CORR_SQL = f"""
    WITH e AS ({EVENTS_US_SQL}),
    hourly AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             COUNT(*) AS c,
             CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS sc
      FROM e GROUP BY event_type, epoch_us(ts) // 3600000000
    ),
    rolled AS (
      SELECT event_type, hr,
             COUNT(*) OVER w AS n,
             SUM(c) OVER w AS sx, SUM(sc) OVER w AS sy,
             SUM(c * c) OVER w AS sxx, SUM(sc * sc) OVER w AS syy,
             SUM(c * sc) OVER w AS sxy
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN {_CORR_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(hr AS BIGINT) AS hr,
           ROUND((n * sxy - sx * sy) /
                 SQRT((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy))
                 * 1e6) / 1e6 AS corr24
    FROM rolled
    WHERE n = {_CORR_WIN}
      AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    ORDER BY event_type, hr
"""


@register("win_rolling_corr", sql=_ROLLING_CORR_SQL)
def win_rolling_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling Pearson correlation between hourly event count and
    hourly summed value, over a trailing {_CORR_WIN}-hour window per
    event type — the drift signal "is volume still tracking value".
    The hourly value sum quantizes to integer cents BEFORE the window
    sums, so all five rolling sums are exact integers and the one
    double division at the end is bit-identical cross-engine (the
    win_hll/corr-matrix portability rule). Windows partition by event
    type; full windows only; zero-variance windows are excluded (their
    correlation is undefined)."""
    from engine.canon import floordiv_sql

    ev = T(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type", floordiv_sql("unix_micros(ts)", 3_600_000_000).alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("sc"),
    )
    w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        -(_CORR_WIN - 1), 0
    )
    rolled = hourly.select(
        "event_type",
        "hr",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("c").over(w).alias("sx"),
        F.sum("sc").over(w).alias("sy"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("sxx"),
        F.sum(F.col("sc") * F.col("sc")).over(w).alias("syy"),
        F.sum(F.col("c") * F.col("sc")).over(w).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        rolled.filter((F.col("n") == _CORR_WIN) & (vx > 0) & (vy > 0))
        .select(
            "event_type",
            F.col("hr").cast("long").alias("hr"),
            dround(
                cov / F.sqrt(vx.cast("double") * vy.cast("double")), 6
            ).alias("corr24"),
        )
        .orderBy("event_type", "hr")
    )
