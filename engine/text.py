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

from engine.registry import register
from engine.session import T

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
    return spark.createDataFrame([(t,) for t in lexicon], "term string")


# df-parameterized cores (unit-testable on inline fixtures, FIXTURES.md B1)


def rank_naive_docs(
    spark: SparkSession, docs: DataFrame, lexicon: list[str] = LEXICON
) -> DataFrame:
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).cache()
    counts = [
        (term, toks.filter(F.array_contains("toks", term)).count()) for term in lexicon
    ]
    toks.unpersist()
    return _with_rank(
        spark.createDataFrame([(t, c) for t, c in counts], "term string, cnt bigint")
    )


def rank_index_docs(
    spark: SparkSession, docs: DataFrame, lexicon: list[str] = LEXICON
) -> DataFrame:
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    lex = F.broadcast(_lexicon_df(spark, lexicon))
    hits = (
        lex.join(toks, "term", "left")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("cnt"))
    )
    return _with_rank(hits)


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
