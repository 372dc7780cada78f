"""wiki_* — ports of the wikipedia language-ranking assignment
(SURVEY.md §2 Table C; canonical handout
wikipedia/src/main/scala/wikipedia/WikipediaRanking.scala:
`occurrencesOfLang`/`rankLangs` ~L30, `makeIndex`/`rankLangsUsingIndex`
~L45, `rankLangsReduceByKey` ~L60 — checkout empty at build time, see
SURVEY.md §0).

Semantics: for each term in a fixed 15-term lexicon, count documents
whose space-split text contains the term as a WHOLE token (substring
matches must not count — `text.split(' ').contains(lang)` [H]); rank
descending, ties broken by term ascending. All three variants must
return identical rankings — that equality is the course's own test
invariant (WikipediaSuite [H]).

The three variants deliberately differ in *plan shape*, mirroring the
course's optimization lesson:
- naive: one filter+count job per term over a cached scan (the
  "rescan 15×" strategy — rdd.aggregate per lang)
- index: inverted index (explode → distinct → join) then size per key
  (groupByKey+mapValues analog)
- reduce: counting aggregation with map-side partial aggregation
  (reduceByKey analog — Catalyst plans partial+final HashAggregate)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.canon import dround
from engine.registry import register
from engine.session import T, tiny_df

#: FIXTURES.md B4 lexicon — one term per LANGS slot, fixed order.
LEXICON = [
    "spark", "query", "join", "sort", "hash",
    "merge", "scan", "filter", "group", "window",
    "table", "row", "key", "batch", "value",
]

_LEX_VALUES = ", ".join(f"('{t}')" for t in LEXICON)

_RANK_SQL = f"""
    WITH lex(term) AS (VALUES {_LEX_VALUES}),
    toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents),
    hits AS (
      SELECT lex.term, COUNT(DISTINCT toks.doc_id) AS cnt
      FROM lex LEFT JOIN toks ON toks.tok = lex.term
      GROUP BY lex.term
    )
    SELECT term, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank
    FROM hits
"""


def _with_rank(df: DataFrame) -> DataFrame:
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    return df.select("term", "cnt", F.row_number().over(w).alias("rank"))


def _lexicon_df(spark: SparkSession, lexicon: list[str]) -> DataFrame:
    return tiny_df(spark, [(t,) for t in lexicon], "term string")


# df-parameterized cores (unit-testable on inline fixtures, FIXTURES.md B1)


def rank_naive_docs(
    spark: SparkSession, docs: DataFrame, lexicon: list[str] = LEXICON
) -> DataFrame:
    # still ONE count job per lexicon term over the cached token scan
    # (the declared naive shape) — but the cache is materialized once
    # up front and the 15 independent probe jobs are submitted from a
    # small pool so they back-fill each other's stragglers instead of
    # paying 15 serial job latencies (guide §2.6; r13)
    from concurrent.futures import ThreadPoolExecutor

    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).cache()
    toks.count()  # build the cache once, not under 4 concurrent probes

    def probe(term: str) -> int:
        return toks.filter(F.array_contains("toks", term)).count()

    with ThreadPoolExecutor(max_workers=4) as pool:
        counts = list(zip(lexicon, pool.map(probe, lexicon)))
    toks.unpersist()
    return _with_rank(
        tiny_df(spark, [(t, c) for t, c in counts], "term string, cnt bigint")
    )


def rank_index_docs(
    spark: SparkSession, docs: DataFrame, lexicon: list[str] = LEXICON
) -> DataFrame:
    # Filter the exploded tokens down to the 15 lexicon terms BEFORE any
    # join/aggregate: putting the lexicon on the preserved side of a left
    # join forces Spark to broadcast/shuffle the ENTIRE token corpus
    # (VERDICT r3's one confirmed scale-killer). An isin literal filter
    # prunes at the scan side, the aggregate sees only lexicon hits, and
    # the 15-row lexicon is joined back onto the 15-row aggregate for
    # 0-hit terms.
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term").isin(lexicon)
    )
    hits = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("cnt"))
    lex = F.broadcast(_lexicon_df(spark, lexicon))
    full = lex.join(hits, "term", "left").select(
        "term", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return _with_rank(full)


def rank_reduce_docs(
    spark: SparkSession, docs: DataFrame, lexicon: list[str] = LEXICON
) -> DataFrame:
    pairs = (
        docs.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
        .select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(lexicon))
    )
    hits = pairs.groupBy("term").agg(F.count("*").alias("cnt"))
    lex = F.broadcast(_lexicon_df(spark, lexicon))
    full = lex.join(hits, "term", "left").select(
        "term", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return _with_rank(full)


@register("wiki_rank_naive", sql=_RANK_SQL)
def wiki_rank_naive(spark: SparkSession, sf: str) -> DataFrame:
    """Naive rescan: one count job per lexicon term over a cached token
    scan (reference `rankLangs`: aggregate per lang over wikiRdd.cache()).
    Deliberately the slow plan shape; kept faithful, but the scan is
    tokenized once and cached so the 15 passes don't re-read parquet."""
    return rank_naive_docs(spark, T(spark, sf, "documents"))


@register("wiki_rank_index", sql=_RANK_SQL)
def wiki_rank_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted index: (term → docs mentioning it), then size per term
    (reference `makeIndex`+`rankLangsUsingIndex`). The lexicon join is a
    broadcast; countDistinct collapses the per-doc duplicates."""
    return rank_index_docs(spark, T(spark, sf, "documents"))


@register("wiki_rank_reduce", sql=_RANK_SQL)
def wiki_rank_reduce(spark: SparkSession, sf: str) -> DataFrame:
    """reduceByKey analog: distinct (term, doc) pairs then a counting
    aggregation — partial+final HashAggregate, the plan the course
    teaches you to prefer (`rankLangsReduceByKey` [H]). Must equal both
    other variants. 0-hit terms still rank (left join back to the
    lexicon) so all three variants agree on all 15 rows."""
    return rank_reduce_docs(spark, T(spark, sf, "documents"))


# --------------------------------------------------------------------------
# text_* — LLM-pipeline text analysis (SURVEY.md §2 Table D + extensions)
# --------------------------------------------------------------------------


@register(
    "text_wordcount_topn",
    sql="""
    SELECT token, cnt, rnk FROM (
      SELECT token, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rnk
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
      GROUP BY token) t
    WHERE rnk <= 20
    """,
)
def text_wordcount_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Global token frequency top-20 (deterministic tiebreak token asc).
    Partial aggregation shrinks the shuffle to distinct tokens; the
    top-k itself is orderBy+limit → TakeOrderedAndProject (per-partition
    heap top-20, then a 20-row merge) instead of a global row_number
    window, which would sort the ENTIRE vocabulary in one reducer —
    fine at sf0.1, a wall at 100 TB. The rank column is derived after
    the limit, so the only single-partition work is over 20 rows."""
    d = T(spark, sf, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(20)
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return top.withColumn("rnk", F.row_number().over(w))


@register(
    "text_tfidf_topterms",
    sql="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (LN((n.n + 1.0) / (df.df + 1.0)) + 1.0) * 1e6) / 1e6
               AS score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, score FROM (
      SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rn
      FROM scored) t
    WHERE rn = 1
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf: str) -> DataFrame:
    """tf-idf, top term per document: idf = ln((N+1)/(df+1)) + 1 (smooth
    variant). All native; N joins in as a broadcast 1-row aggregate so
    the plan stays fully declarative (no driver-side count)."""
    d = T(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            dround(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "term", "score")
    )


@register(
    "text_lang_dist",
    sql="""
    SELECT lang, source, COUNT(*) AS n_docs,
           ROUND(AVG(n_chars) * 100) / 100 AS avg_chars,
           CAST(GROUPING(lang) AS INT) AS g_lang,
           CAST(GROUPING(source) AS INT) AS g_source
    FROM documents GROUP BY ROLLUP(lang, source)
    """,
)
def text_lang_dist(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus composition: doc count + avg length by lang × source with
    rollup totals."""
    d = T(spark, sf, "documents")
    return d.rollup("lang", "source").agg(
        F.count("*").alias("n_docs"),
        dround(F.avg("n_chars"), 2).alias("avg_chars"),
        F.grouping("lang").cast("int").alias("g_lang"),
        F.grouping("source").cast("int").alias("g_source"),
    )


#: tiny per-language marker lexicons for the heuristic language-ID.
#: The testdata text is synthetic analytics word-soup, so these are
#: markers chosen from its vocabulary per n-gram frequency — the
#: OPERATOR (argmax of marker-hit ratios with a fixed priority) is the
#: real thing; swap lexicons for real char-n-gram tables on real text.
LANGID_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "slow"],
    "es": ["spark", "query", "row"],
    "fr": ["join", "table", "key"],
    "de": ["group", "sort", "batch"],
    "zh": ["hash", "merge", "value"],
}

_LANGID_SCORES_SQL = ", ".join(
    "LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')), "
    f"[{', '.join(repr(m) for m in marks)}])) AS s_{lang}"
    for lang, marks in LANGID_MARKERS.items()
)
_LANGID_ARGMAX_SQL = "CASE " + " ".join(
    f"WHEN s_{lang} >= GREATEST(s_en, s_es, s_fr, s_de, s_zh) THEN '{lang}'"
    for lang in ("en", "es", "fr", "de", "zh")
) + " END"


@register(
    "text_langid",
    sql=f"""
    SELECT doc_id, lang, {_LANGID_ARGMAX_SQL} AS pred_lang
    FROM (SELECT doc_id, lang, {_LANGID_SCORES_SQL} FROM documents) t
    """,
)
def text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language-ID: marker-token hit counts per language,
    argmax with fixed priority order (en > es > fr > de > zh on ties).
    Single narrow pass — no shuffle."""
    d = T(spark, sf, "documents")
    toks = F.array_distinct(F.split("text", " "))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in marks])))
        for lang, marks in LANGID_MARKERS.items()
    }
    scored = d.select(
        "doc_id", "lang", *[scores[lang].alias(f"s_{lang}") for lang in scores]
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGID_MARKERS])
    pred = F.when(F.col("s_en") >= best, "en")
    for lang in ("es", "fr", "de", "zh"):
        pred = pred.when(F.col(f"s_{lang}") >= best, lang)
    return scored.select("doc_id", "lang", pred.alias("pred_lang"))


_STOPWORDS = ["the", "a", "of", "and", "to"]


@register(
    "text_quality",
    sql=f"""
    WITH t AS (
      SELECT doc_id, n_chars,
             STRING_SPLIT(text, ' ') AS toks,
             LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS uniq
      FROM documents
    )
    SELECT doc_id,
           LEN(toks) AS n_tokens,
           ROUND(n_chars / (LEN(toks) * 1.0) * 10000) / 10000 AS avg_tok_len,
           ROUND(LEN(uniq) / (LEN(toks) * 1.0) * 10000) / 10000 AS uniq_ratio,
           ROUND(LEN(LIST_INTERSECT(uniq, [{", ".join(repr(s) for s in _STOPWORDS)}]))
                 / (LEN(uniq) * 1.0) * 10000) / 10000 AS stop_ratio,
           (LEN(toks) BETWEEN 20 AND 1000) AND
           (n_chars / (LEN(toks) * 1.0) BETWEEN 2 AND 12) AS quality_ok
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: token count, mean token length, type/token ratio,
    stopword ratio, and a composite keep/drop flag — the standard
    pretraining-filter features, all as one narrow projection."""
    d = T(spark, sf, "documents")
    toks = F.split("text", " ")
    uniq = F.array_distinct(toks)
    n_toks = F.size(toks)
    avg_tok = F.col("n_chars") / (n_toks * F.lit(1.0))
    t = d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        dround(avg_tok, 4).alias("avg_tok_len"),
        dround(F.size(uniq) / (n_toks * F.lit(1.0)), 4).alias("uniq_ratio"),
        dround(
            F.size(F.array_intersect(uniq, F.array(*[F.lit(s) for s in _STOPWORDS])))
            / (F.size(uniq) * F.lit(1.0)),
            4,
        ).alias("stop_ratio"),
        (n_toks.between(20, 1000) & avg_tok.between(2, 12)).alias("quality_ok"),
    )
    return t


@register(
    "text_tokens",
    sql="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_ws,
           LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+')) AS n_re,
           CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_bpe_est
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting three ways: whitespace split, BPE-ish regex word
    pieces, and the chars/4 estimator used for quick budget math."""
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)).alias("n_re"),
        F.ceil(F.col("n_chars") / 4.0).alias("n_bpe_est"),
    )


@register(
    "text_fingerprint",
    sql="""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                 t -> ('0x' || SUBSTR(MD5(t), 1, 15))::BIGINT % 1000000007)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint,
           n_chars
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint: polynomial rolling hash over token hashes
    (mod 2^31-ish prime so the fold never overflows ANSI bigint math).
    Equal fingerprints → exact-duplicate token sequences. Narrow pass;
    dedup on the fingerprint is then a cheap groupBy.

    Portable (r3): the per-token hash is md5's first 15 hex chars as a
    60-bit integer (bit-identical in any engine with md5 — same
    contract as dedup_simhash), and the fold is plain modular
    arithmetic, so the oracle replays the identical rolling hash with
    list_reduce and the fingerprints must match value-for-value."""
    d = T(spark, sf, "documents")
    prime = F.lit(1_000_000_007).cast("long")
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")  # noqa: E731
    fp = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 31 + F.pmod(tok_hash(t), prime), prime),
    )
    return d.select("doc_id", fp.alias("fingerprint"), "n_chars")


# --------------------------------------------------------------------------
# A3 port: pseudo-XML line parsing (WikipediaData.parse [H])
# --------------------------------------------------------------------------


@register(
    "wiki_parse_lines",
    sql="""
    SELECT doc_id, CAST(LENGTH(text) AS INT) AS text_len,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens
    FROM documents
    """,
)
def wiki_parse_lines(spark: SparkSession, sf: str) -> DataFrame:
    """`WikipediaData.parse` [H]: one `<page><title>T</title><text>B
    </text></page>` line per article, parsed by marker extraction. We
    synthesize the raw-line form from documents (FIXTURES.md B1), write
    it as a text source, re-read with spark.read.text, and parse with
    native regexp_extract — the substring-between-markers semantics of
    the handout, minus the driver-side List[String] (the handout reads
    the whole file on the driver; a text source scan distributes).

    Oracled: the synthesized markup round-trips losslessly (document
    text contains no newlines or marker strings, checked in testdata),
    so parse∘synthesize is the identity and the oracle is the same
    length/token stats straight off the documents table."""
    from engine.session import scratch_dir

    out = scratch_dir("wiki_lines")
    d = T(spark, sf, "documents")
    raw = d.select(
        F.concat(
            F.lit("<page><title>doc-"),
            F.col("doc_id").cast("string"),
            F.lit("</title><text>"),
            F.col("text"),
            F.lit("</text></page>"),
        ).alias("value")
    )
    raw.write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.regexp_extract("value", r"<title>doc-(\d+)</title>", 1)
        .cast("long")
        .alias("doc_id"),
        F.regexp_extract("value", r"<text>(.*)</text>", 1).alias("text"),
    )
    return parsed.select(
        "doc_id", F.length("text").alias("text_len"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


@register(
    "pipeline_pretrain_filter",
    sql="""
    WITH scored AS (
      SELECT doc_id, lang, text,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             n_chars / (LEN(STRING_SPLIT(text, ' ')) * 1.0) AS avg_tok
      FROM documents
    ),
    kept AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN 20 AND 1000 AND avg_tok BETWEEN 2 AND 12
    ),
    deduped AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT doc_id, lang, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY LOWER(TRIM(text))
                                  ORDER BY doc_id) AS rn
        FROM kept) t
      WHERE rn = 1
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_tokens) * 100) / 100 AS avg_tokens
    FROM deduped GROUP BY lang
    """,
)
def pipeline_pretrain_filter(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end pretraining-data pipeline: quality filter → exact
    dedup → per-language token budget. The composition is the point —
    each stage is one of this engine's operators, fused by Catalyst into
    a single scan + one window shuffle + one aggregation (no
    materialization between stages)."""
    d = T(spark, sf, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id", "lang", "text",
        F.size(toks).alias("n_tokens"),
        (F.col("n_chars") / (F.size(toks) * F.lit(1.0))).alias("avg_tok"),
    )
    kept = scored.filter(
        F.col("n_tokens").between(20, 1000) & F.col("avg_tok").between(2, 12)
    )
    w = Window.partitionBy(F.lower(F.trim(F.col("text")))).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        dround(F.avg("n_tokens"), 2).alias("avg_tokens"),
    )


_REPETITION_SQL = """
    WITH sh AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')) - 2),
                            i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
               AS grams
      FROM documents
      WHERE LEN(STRING_SPLIT(text, ' ')) >= 3
    )
    SELECT doc_id, LEN(grams) AS n_grams,
           LEN(LIST_DISTINCT(grams)) AS n_uniq,
           ROUND((1.0 - LEN(LIST_DISTINCT(grams)) / LEN(grams)) * 1e4) / 1e4
             AS rep_ratio
    FROM sh
"""


@register("text_repetition_ratio", sql=_REPETITION_SQL)
def text_repetition_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition ratio over 3-gram shingles — the
    standard pretrain quality signal for loop/boilerplate text (docs
    repeating the same phrases score high and get filtered). Entirely
    native array expressions: one narrow pass, no shuffle, no UDF."""
    d = T(spark, sf, "documents")
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 3)),
    )
    return (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", grams.alias("grams"))
        .select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.size(F.array_distinct("grams")).alias("n_uniq"),
            dround(
                1.0 - F.size(F.array_distinct("grams")) / F.size("grams"), 4
            ).alias("rep_ratio"),
        )
    )
