"""Layer-2 reference-semantics tests (SURVEY.md §5.2): ports of the
course suites' golden micro-cases (FIXTURES.md B1/B2 shapes) plus the
cross-variant equality invariants the course itself asserts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.kmeans import kmeans_fit
from engine.registry import all_queries
from engine.text import rank_index_docs, rank_naive_docs, rank_reduce_docs

from .conftest import SF_SMOKE

QUERIES = all_queries()


# --- WikipediaSuite shapes [H] --------------------------------------------


def test_wiki_occurrences_micro(spark):
    # "occurrencesOfLang should work for RDD with one element"
    docs = spark.createDataFrame(
        [(0, "Java Scala")], "doc_id long, text string"
    )
    r = {x["term"]: x["cnt"] for x in rank_naive_docs(spark, docs, ["Java", "C++"]).collect()}
    assert r == {"Java": 1, "C++": 0}


def test_wiki_whole_token_semantics(spark):
    # substring matches must NOT count: text.split(' ').contains(lang)
    docs = spark.createDataFrame(
        [(0, "javascripted code"), (1, "spark here")], "doc_id long, text string"
    )
    for fn in (rank_naive_docs, rank_index_docs, rank_reduce_docs):
        r = {x["term"]: x["cnt"] for x in fn(spark, docs, ["spark"]).collect()}
        assert r == {"spark": 1}, fn.__name__


def test_wiki_ranking_micro(spark):
    # ranking ["Scala","Java"] over two docs = [(Scala,2),(Java,1)]
    docs = spark.createDataFrame(
        [(0, "Scala Java"), (1, "Scala")], "doc_id long, text string"
    )
    expected = [("Scala", 2, 1), ("Java", 1, 2)]
    for fn in (rank_naive_docs, rank_index_docs, rank_reduce_docs):
        got = [
            (r["term"], r["cnt"], r["rank"])
            for r in fn(spark, docs, ["Scala", "Java"]).orderBy("rank").collect()
        ]
        assert got == expected, fn.__name__


def test_wiki_three_variants_agree(spark):
    # the course's own invariant, on real data: identical desc-ordered ranking
    results = [
        sorted(map(tuple, QUERIES[k](spark, SF_SMOKE).collect()))
        for k in ("wiki_rank_naive", "wiki_rank_index", "wiki_rank_reduce")
    ]
    assert results[0] == results[1] == results[2]
    by_rank = sorted(results[0], key=lambda t: t[2])
    cnts = [t[1] for t in by_rank]
    assert cnts == sorted(cnts, reverse=True)  # assertEquivalentAndOrdered


# --- StackOverflowSuite shapes [H] ----------------------------------------


def _so_fixture(spark):
    # Q(id=1) with answers 5, 11; Q(id=2) with answer 3; Q(id=3) unanswered
    orders = spark.createDataFrame(
        [(1,), (2,), (3,)], "o_orderkey long"
    ).select("o_orderkey", F.lit("x").alias("pad"))
    lineitem = spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, 11.0), (2, 1, 3.0)],
        "l_orderkey long, l_linenumber int, l_extendedprice double",
    )
    return orders, lineitem


def test_so_grouped_scored_micro(spark):
    orders, li = _so_fixture(spark)
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")
    grouped = (
        joined.groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_list("l_linenumber")).alias("lines"),
        )
        .collect()
    )
    g = {r["o_orderkey"]: (r["n"], r["lines"]) for r in grouped}
    # unanswered question 3 dropped by the inner join [H]
    assert g == {1: (2, [1, 2]), 2: (1, [1])}
    scored = (
        joined.groupBy("o_orderkey").agg(F.max("l_extendedprice").alias("hs")).collect()
    )
    assert {r["o_orderkey"]: r["hs"] for r in scored} == {1: 11.0, 2: 3.0}


def test_so_vectors_spread(spark):
    rows = QUERIES["so_vectors"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["x"] == (r["o_orderkey"] % 10) * 50000


# --- k-means ---------------------------------------------------------------


def test_kmeans_toy_two_clusters(spark):
    # two well-separated planted clusters, labels 0/1 → exact recovery
    pts = [(i, [0.0 + 0.1 * i, 0.0], 0) for i in range(4)]
    pts += [(10 + i, [100.0 + 0.1 * i, 100.0], 1) for i in range(4)]
    emb = spark.createDataFrame(
        pts, "vec_id long, embedding array<float>, label int"
    )
    means, it = kmeans_fit(emb, eta=1e-9, max_iter=50)
    assert it <= 50 and len(means) == 2
    assert abs(means[0][0] - 0.15) < 1e-3 and abs(means[1][0] - 100.15) < 1e-3
    assert abs(means[0][1] - 0.0) < 1e-6 and abs(means[1][1] - 100.0) < 1e-6


def test_kmeans_converges_and_is_stable(spark):
    df = QUERIES["so_kmeans"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows and rows[0]["iterations"] <= 120
    assert sum(r["size"] for r in rows) == 500  # every vector assigned
    again = QUERIES["so_kmeans"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# --- TimeUsageSuite shapes [H] ---------------------------------------------


@pytest.mark.parametrize("other", ["tu_grouped_sql", "tu_grouped_typed"])
def test_tu_three_paths_equal(spark, other):
    base = sorted(map(tuple, QUERIES["tu_grouped"](spark, SF_SMOKE).collect()))
    alt = sorted(map(tuple, QUERIES[other](spark, SF_SMOKE).collect()))
    assert base == alt


def test_tu_summary_shape(spark):
    df = QUERIES["tu_summary"](spark, SF_SMOKE)
    assert df.columns == [
        "user_id", "working", "sex", "age", "primary_h", "work_h", "other_h"
    ]
    rows = df.collect()
    # the telfs<=4 analog filter drops uid%10==9
    assert all(r["user_id"] % 10 != 9 for r in rows)
    assert all(r["primary_h"] >= 0 for r in rows)


# --- custom ops (SURVEY.md §4.2) -------------------------------------------


def test_sample_per_group_exact_n_and_deterministic(spark):
    df = QUERIES["sample_per_group"](spark, SF_SMOKE)
    rows = df.collect()
    per_group: dict[int, int] = {}
    for r in rows:
        per_group[r["o_custkey"]] = per_group.get(r["o_custkey"], 0) + 1
    assert all(n <= 3 for n in per_group.values())
    # groups with >=3 orders yield exactly 3
    from engine.session import T as _T

    sizes = {
        r["o_custkey"]: r["n"]
        for r in _T(spark, SF_SMOKE, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for g, n in per_group.items():
        assert n == min(3, sizes[g]), (g, n, sizes[g])
    again = QUERIES["sample_per_group"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_wiki_parse_roundtrip(spark):
    parsed = QUERIES["wiki_parse_lines"](spark, SF_SMOKE)
    from engine.session import T as _T

    orig = _T(spark, SF_SMOKE, "documents").select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    assert sorted(map(tuple, parsed.collect())) == sorted(map(tuple, orig.collect()))


# --- hypothesis property tests (SURVEY.md §5.2 layer 3) ---------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["spark", "join", "row", "x", "y", "javascripted"]),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_prop_wiki_rankers_agree(spark, docs):
    """Property: on ANY document set, the three ranking plan shapes
    return identical (term, cnt, rank) triples."""
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    lex = ["spark", "join", "row"]
    res = [
        sorted(map(tuple, fn(spark, df, lex).collect()))
        for fn in (rank_naive_docs, rank_index_docs, rank_reduce_docs)
    ]
    assert res[0] == res[1] == res[2]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=5400), min_size=1, max_size=12)
)
def test_prop_session_window_equals_gaps_and_islands(spark, gaps):
    """Property: F.session_window sessionization equals the lag-based
    gaps-and-islands formulation for ANY event spacing (30-min gap)."""
    import datetime as dt

    ts = [dt.datetime(2024, 1, 1)]
    for g in gaps:
        ts.append(ts[-1] + dt.timedelta(seconds=g))
    df = spark.createDataFrame([(1, t) for t in ts], "user_id long, ts timestamp")

    sw = sorted(
        (r["w"]["start"], r["cnt"])
        for r in df.groupBy(F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    from pyspark.sql import Window as W

    lagged = df.withColumn(
        "new_s",
        F.when(
            (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(
                W.partitionBy("user_id").orderBy("ts")
            ) > 1800)
            | F.lag("ts").over(W.partitionBy("user_id").orderBy("ts")).isNull(),
            1,
        ).otherwise(0),
    ).withColumn(
        "sess",
        F.sum("new_s").over(
            W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    gi = sorted(
        (r["start"], r["cnt"])
        for r in lagged.groupBy("sess")
        .agg(F.min("ts").alias("start"), F.count("*").alias("cnt"))
        .collect()
    )
    assert sw == gi


def test_try_arith_rounding_on_adversarial_tax_values(spark):
    """fn_try_arith's q_div_tax divisor must ROUND l_tax*100, not
    truncate: FP representation makes 0.29*100 = 28.999...96 and
    0.57*100 = 56.999...94, so a bare cast('long') truncates to 28/56
    while DuckDB's CAST(ROUND(...) AS BIGINT) gives 29/57 — green only
    by data luck until r3 (VERDICT). Pin the semantics on the exact
    adversarial values so a refactor can't regress them."""
    import duckdb

    df = spark.createDataFrame(
        [(float(v),) for v in (0.29, 0.57, 0.005, 0.08, 0.999)], "l_tax double"
    )
    got = [
        r[0]
        for r in df.select(
            F.round(F.col("l_tax") * 100, 0).cast("long").alias("d")
        ).collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(ROUND(v * 100) AS BIGINT) FROM (VALUES (0.29), (0.57),"
            " (0.005), (0.08), (0.999)) t(v)"
        ).fetchall()
    ]
    assert got == want == [29, 57, 1, 8, 100]
