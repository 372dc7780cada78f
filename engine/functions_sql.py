"""Scalar-function families (SURVEY.md §2 Table B, fn_* keys).

One query key per family, each exercising the family's functions over
real testdata columns with a DuckDB oracle. Cross-engine traps handled
here (and worth knowing at any scale, since they're really
Spark-vs-ANSI semantics):

- day-of-week numbering: Spark ``dayofweek`` is 1=Sunday, DuckDB 0=Sunday
  → both sides emit ISO dow (Mon=1) instead.
- ``floor``/``ceil``: Spark returns BIGINT for double input, DuckDB
  returns DOUBLE → cast the oracle side.
- double→int CAST: Spark truncates, DuckDB rounds → oracle uses
  CAST(TRUNC(x)).
- list functions with unspecified order (``list_distinct``,
  ``list_intersect``) → always sorted before output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.canon import dround, joined, portable_try_int, portable_try_int_sql
from engine.registry import register
from engine.session import T

# --------------------------------------------------------------------------


@register(
    "fn_string",
    sql="""
    SELECT p_partkey,
           UPPER(p_name) AS up,
           LOWER(p_brand) AS lo,
           SUBSTR(p_name, 1, 5) AS sub,
           TRIM(CONCAT(' ', p_name, ' ')) AS trimmed,
           CONCAT_WS('-', p_brand, p_type) AS cw,
           LENGTH(p_name) AS len,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS pad,
           REPLACE(p_name, 'o', '0') AS rep,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word,
           p_name LIKE '%ol%' AS has_ol,
           REGEXP_MATCHES(p_name, 'w.dget') AS re_widget,
           ARRAY_TO_STRING(STRING_SPLIT(p_name, ' '), '|') AS tokens
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 1, 5).alias("sub"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.concat_ws("-", "p_brand", "p_type").alias("cw"),
        F.length("p_name").alias("len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("pad"),
        F.replace(F.col("p_name"), F.lit("o"), F.lit("0")).alias("rep"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.col("p_name").like("%ol%").alias("has_ol"),
        F.col("p_name").rlike("w.dget").alias("re_widget"),
        joined(F.split("p_name", " "), "|").alias("tokens"),
    )


@register(
    "fn_date",
    sql="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS y,
           MONTH(o_orderdate) AS mo,
           DAY(o_orderdate) AS d,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           DATEDIFF('day', DATE '1995-01-01', o_orderdate) AS days_since,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
           CAST(LAST_DAY(o_orderdate) AS DATE) AS month_end,
           ISODOW(o_orderdate) AS isodow,
           EPOCH_US(o_orderdate) // 1000000 AS epoch_s,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS ymd,
           CAST(STRFTIME(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ts_roundtrip
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time family. ISO dow (Mon=1) canonicalizes the engines'
    different weekday conventions (SURVEY.md §7.3)."""
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_add("o_orderdate", 30).alias("plus30"),
        F.last_day("o_orderdate").alias("month_end"),
        (F.weekday("o_orderdate") + 1).alias("isodow"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ymd"),
        F.to_timestamp(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")).alias(
            "ts_roundtrip"
        ),
    )


@register(
    "fn_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
           ABS(l_extendedprice - 50000.0) AS ab,
           ROUND(POWER(l_discount, 2) * 1e10) / 1e10 AS pow2,
           SQRT(l_quantity) AS sq,
           ROUND(LN(l_extendedprice) * 1e10) / 1e10 AS ln_p,
           ROUND(LOG10(l_extendedprice) * 1e10) / 1e10 AS log10_p,
           l_orderkey % 7 AS m7,
           CAST(SIGN(l_discount - 0.03) AS INT) AS sg,
           ((l_orderkey - 100) % 7 + 7) % 7 AS pm7
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf: str) -> DataFrame:
    """Math family. pow/ln/log10 are not IEEE-correctly-rounded (libm
    differs by engine) → canonicalized at 1e-10; sqrt IS correctly
    rounded → compared exactly."""
    li = T(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.abs(F.col("l_extendedprice") - 50000.0).alias("ab"),
        dround(F.pow("l_discount", F.lit(2)), 10).alias("pow2"),
        F.sqrt("l_quantity").alias("sq"),
        dround(F.log("l_extendedprice"), 10).alias("ln_p"),
        dround(F.log10("l_extendedprice"), 10).alias("log10_p"),
        (F.col("l_orderkey") % 7).alias("m7"),
        F.signum(F.col("l_discount") - 0.03).cast("int").alias("sg"),
        (((F.col("l_orderkey") - 100) % 7 + 7) % 7).alias("pm7"),
    )


@register(
    "fn_cast",
    sql="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS price_int,
           {PRIO_TRY_INT} AS prio_int,
           TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           CAST(STRFTIME(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ts_rt
    FROM orders
    """.replace("{PRIO_TRY_INT}", portable_try_int_sql("o_orderpriority")),
)
def fn_cast(spark: SparkSession, sf: str) -> DataFrame:
    """Cast family. Spark double→int truncates while DuckDB rounds, so
    the oracle spells TRUNC explicitly.

    prio_int pins an EXPLICIT portable accepted-set for the TRY cast
    (trimmed optional-sign integer), mirrored in the oracle: bare
    TRY_CAST disagrees across engines on '12.5' / '0x1F' / '1e2' /
    tab-wrapped ints (DuckDB rounds/parses hex/scientific, Spark ANSI
    rejects), a latent hash-flip on regenerated data. The regex gate is
    also the fast path: under ANSI, try_cast on a non-numeric string
    raises-and-catches PER ROW inside codegen — 14× slower than the
    never-taken branch (1.40 s → 0.10 s for this column at sf0.1).
    prio_digit stays a bare try_cast on a single char, where the
    engines' accepted sets genuinely coincide."""
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_rt"),
        F.col("o_totalprice").cast("long").alias("price_int"),
        portable_try_int("o_orderpriority").alias("prio_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.to_timestamp(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")).alias(
            "ts_rt"
        ),
    )


_LEX_LIT = "['spark', 'query', 'join']"


@register(
    "fn_array",
    sql=f"""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), '|')
             AS uniq_sorted,
           ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:3], '|') AS first3,
           COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_INTERSECT(
             LIST_DISTINCT(STRING_SPLIT(text, ' ')), {_LEX_LIT})), '|'), '')
             AS lex_hits
    FROM documents
    """,
)
def fn_array(spark: SparkSession, sf: str) -> DataFrame:
    """Array family over tokenized documents. Unordered list ops
    (distinct/intersect) are sorted before output — DuckDB doesn't
    guarantee their order."""
    d = T(spark, sf, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        joined(F.sort_array(F.array_distinct(toks)), "|").alias("uniq_sorted"),
        joined(F.slice(toks, 1, 3), "|").alias("first3"),
        joined(
            F.sort_array(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(F.lit("spark"), F.lit("query"), F.lit("join")),
                )
            ),
            "|",
        ).alias("lex_hits"),
    )


@register(
    "fn_explode",
    sql="""
    SELECT doc_id,
           UNNEST(STRING_SPLIT(text, ' ')) AS token,
           GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) - 1 AS pos
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def fn_explode(spark: SparkSession, sf: str) -> DataFrame:
    """A8 port (rdd.flatMap → explode). posexplode gives 0-based pos;
    DuckDB zips unnest with generate_subscripts."""
    d = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))


@register(
    "fn_map",
    sql="""
    WITH per AS (
      SELECT lang, source, COUNT(*) AS cnt
      FROM documents GROUP BY lang, source
    )
    SELECT lang,
           CAST(COUNT(*) AS INT) AS n_sources,
           MAX(CASE WHEN source = 'src0' THEN cnt END) AS src0_cnt,
           STRING_AGG(source, ',' ORDER BY source) AS sources
    FROM per GROUP BY lang ORDER BY lang
    """,
)
def fn_map(spark: SparkSession, sf: str) -> DataFrame:
    """Map family: build source→doc-count map per lang from aggregates,
    then element_at / map_keys. The map itself never leaves the plan —
    every output column is scalarized (size / element_at / joined keys),
    so the relational equivalent (count + conditional max + string_agg)
    is a full value-level oracle despite DuckDB having no Spark-style
    map comparisons."""
    d = T(spark, sf, "documents")
    per = d.groupBy("lang", "source").agg(F.count("*").alias("cnt"))
    return (
        per.groupBy("lang")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("source", "cnt")))
            ).alias("m")
        )
        .select(
            "lang",
            F.size(F.map_keys(F.col("m"))).alias("n_sources"),
            F.element_at(F.col("m"), "src0").alias("src0_cnt"),
            joined(F.sort_array(F.map_keys(F.col("m")))).alias("sources"),
        )
        .orderBy("lang")
    )


@register(
    "fn_json",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           to_json(struct_pack(et := event_type,
                               k := CAST(json_extract_string(props, '$.k') AS BIGINT)))
             AS packed
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf: str) -> DataFrame:
    """JSON family: extract + re-serialize a struct. Field order in
    to_json follows declaration order on both engines."""
    ev = T(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.to_json(F.struct(F.col("event_type").alias("et"), k.alias("k"))).alias(
            "packed"
        ),
    )


@register(
    "fn_struct",
    sql="""
    SELECT r_regionkey, kind, val,
           to_json(struct_pack(kind := kind, val := val)) AS s_json
    FROM (
      SELECT r_regionkey, 'U' AS kind, UPPER(r_name) AS val FROM region
      UNION ALL
      SELECT r_regionkey, 'L' AS kind, LOWER(r_name) AS val FROM region
    ) t
    """,
)
def fn_struct(spark: SparkSession, sf: str) -> DataFrame:
    """Struct family: nest, inline (struct-array → rows), field access,
    JSON canonicalization (multimodal-column shape, SURVEY.md §2 D)."""
    r = T(spark, sf, "region")
    exploded = r.select(
        "r_regionkey",
        F.inline(
            F.array(
                F.struct(F.lit("U").alias("kind"), F.upper("r_name").alias("val")),
                F.struct(F.lit("L").alias("kind"), F.lower("r_name").alias("val")),
            )
        ),
    )
    s = F.struct(F.col("kind"), F.col("val"))
    return exploded.select(
        "r_regionkey",
        s.getField("kind").alias("kind"),
        s.getField("val").alias("val"),
        F.to_json(s).alias("s_json"),
    )


@register(
    "fn_bitwise",
    sql="""
    SELECT l_orderkey,
           l_orderkey & 255 AS b_and,
           l_orderkey | 4096 AS b_or,
           XOR(l_orderkey, l_partkey) AS b_xor,
           l_orderkey << 2 AS b_shl,
           l_orderkey >> 3 AS b_shr
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def fn_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise family (bucketing/sharding arithmetic at scale)."""
    li = T(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.col("l_partkey")).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
    )


@register(
    "fn_hash",
    sql="""
    SELECT p_partkey,
           MD5(p_name) AS h_md5,
           SHA256(p_name) AS h_sha256,
           LENGTH(MD5(p_brand)) AS md5_len
    FROM part
    """,
)
def fn_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Cryptographic digests (content-addressing / dedup keys): md5 and
    sha-256 hex agree across engines byte-for-byte."""
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
        F.length(F.md5("p_brand")).alias("md5_len"),
    )


@register(
    "fn_explode_outer",
    sql="""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN CAST([] AS VARCHAR[])
                  ELSE STRING_SPLIT(text, ' ')[1:3] END AS arr
      FROM documents
    )
    SELECT doc_id, UNNEST(arr) AS token FROM t WHERE LEN(arr) > 0
    UNION ALL
    SELECT doc_id, NULL AS token FROM t WHERE LEN(arr) = 0
    """,
)
def fn_explode_outer(spark: SparkSession, sf: str) -> DataFrame:
    """explode_outer edge semantics: empty arrays keep their row with a
    NULL element (plain explode would drop them — silently losing
    documents in a pipeline)."""
    d = T(spark, sf, "documents")
    arr = F.when(
        F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split("text", " "), 1, 3))
    return d.select("doc_id", F.explode_outer(arr).alias("token"))


@register(
    "fn_array_lambda",
    sql="""
    SELECT doc_id,
           ARRAY_TO_STRING(
             LIST_SORT(LIST_TRANSFORM(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                                      t -> UPPER(t)))[1:5], '|') AS up5,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 4))
             AS n_long,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t = 'spark')) > 0
             AS has_spark,
           CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                        t -> LENGTH(t))) AS BIGINT) AS total_len
    FROM documents
    """,
)
def fn_array_lambda(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions (transform / filter / exists /
    aggregate with lambdas) — the Catalyst-native replacement for what
    would otherwise be per-row Python UDFs."""
    d = T(spark, sf, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        joined(
            F.slice(
                F.sort_array(
                    F.transform(F.array_distinct(toks), lambda t: F.upper(t))
                ),
                1,
                5,
            ),
            "|",
        ).alias("up5"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),
        F.exists(toks, lambda t: t == F.lit("spark")).alias("has_spark"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_len"),
    )


@register(
    "fn_interval",
    sql="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
           CAST(o_orderdate - INTERVAL 45 DAY AS DATE) AS minus_45d,
           DATEDIFF('month', DATE '1995-01-01', o_orderdate) AS months_since,
           CAST(o_orderdate + INTERVAL 3 HOUR + INTERVAL 30 MINUTE AS TIMESTAMP)
             AS plus_3h30m
    FROM orders
    """,
)
def fn_interval(spark: SparkSession, sf: str) -> DataFrame:
    """Interval arithmetic family. Month arithmetic is calendar-aware on
    both engines (Jan 31 + 1 month = Feb 28/29); month-diff is the
    integer date_part difference (Spark's fractional months_between is
    engine-specific, so the canonical surface is the integer form)."""
    o = T(spark, sf, "orders")
    months_since = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 2).alias("plus_2mo"),
        F.date_sub("o_orderdate", 45).alias("minus_45d"),
        months_since.cast("long").alias("months_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 HOURS 30 MINUTES")).alias(
            "plus_3h30m"
        ),
    )


@register(
    "fn_variant",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 VARIANT type: parse_json → semi-structured value with
    typed path extraction (try_variant_get). Unlike get_json_object's
    per-access string re-parse, VARIANT parses once into a binary form
    — the right layout for JSON-heavy 100 TB scans. Missing paths →
    NULL via the try_ variant."""
    ev = T(spark, sf, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.missing", "long").alias("missing"),
    )


@register(
    "fn_trig",
    sql="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SIN(l_discount) * 1e10) / 1e10 AS s,
           ROUND(COS(l_discount) * 1e10) / 1e10 AS c,
           ROUND(ATAN2(l_discount, l_tax + 0.001) * 1e10) / 1e10 AS at2,
           ROUND(EXP(l_discount) * 1e10) / 1e10 AS ex,
           ROUND(DEGREES(l_discount) * 1e10) / 1e10 AS deg
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def fn_trig(spark: SparkSession, sf: str) -> DataFrame:
    """Trig/exponential family, canonicalized at 1e-10 (libm functions
    are not correctly-rounded and differ across engines at the ulp)."""
    li = T(spark, sf, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.sin("l_discount"), 10).alias("s"),
        dround(F.cos("l_discount"), 10).alias("c"),
        dround(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.001), 10).alias("at2"),
        dround(F.exp("l_discount"), 10).alias("ex"),
        dround(F.degrees("l_discount"), 10).alias("deg"),
    )


_REGEXP_SQL = """
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS words,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_extract(p_brand, '([A-Za-z]+)#([0-9]+)', 2) AS brand_num,
           CASE WHEN regexp_matches(p_name, '(red|blue) ') THEN 1 ELSE 0 END
             AS is_primary
    FROM part
"""


@register("fn_regexp", sql=_REGEXP_SQL)
def fn_regexp(spark: SparkSession, sf: str) -> DataFrame:
    """Regexp function family: extract-all (canonicalized to a joined
    string so the array never reaches the driver's scalarizer),
    occurrence counting, global replace, group extraction, boolean
    match. All native Catalyst expressions — regexes compile once per
    task via codegen, no Python in the loop."""
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        joined(F.regexp_extract_all(F.col("p_name"), F.lit("([a-z]+)"), 1), "|").alias(
            "words"
        ),
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit("([aeiou])"), 1)).cast(
            "long"
        ).alias("n_vowels"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract(F.col("p_brand"), r"([A-Za-z]+)#([0-9]+)", 2).alias("brand_num"),
        F.when(F.col("p_name").rlike("(red|blue) "), 1).otherwise(0).alias("is_primary"),
    )


@register(
    "fn_posexplode",
    sql="""
    SELECT d.doc_id, CAST(u.i - 1 AS INT) AS pos, d.t[u.i] AS token
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t
          FROM documents WHERE doc_id % 20 = 0) d,
         UNNEST(GENERATE_SERIES(1, LEN(d.t))) AS u(i)
    """,
)
def fn_posexplode(spark: SparkSession, sf: str) -> DataFrame:
    """posexplode: ordinal-preserving flatten (token position is the
    payload — what sequence labeling / n-gram windows need, and what
    plain explode throws away). Oracle is the lateral index-unnest."""
    d = T(spark, sf, "documents").filter(F.col("doc_id") % 20 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
