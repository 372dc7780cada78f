"""Declared UDF surface (SURVEY.md §2 Table B, udf_* keys).

The engine's rule is native Column expressions everywhere (Catalyst
can't see through Python), so the Python-function escape hatch is
quarantined to exactly these keys — mirroring the reference's typed
Dataset lambdas (TimeUsage.scala `timeUsageGroupedTyped` [H], SURVEY.md
§2 A29), which are equally optimizer-opaque.

Performance ladder demonstrated here: row-at-a-time Python UDF (slow
path, per-row pickling) → Arrow-vectorized pandas_udf (~10-100× faster)
→ pandas GROUPED_AGG → Spark 4 Python UDTF. At 100 TB only the Arrow
variants are admissible, and only when no built-in expresses the logic.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from engine.canon import dround
from engine.registry import register
from engine.session import T

# The A24 working-status classifier (TimeUsage.scala `timeUsageSummary`
# [H]: working ⟺ 1 ≤ telfs < 3), ported to the events table per
# FIXTURES.md B4: working ⟺ user_id % 3 < 2.
_CLASSIFY_SQL = "CASE WHEN user_id % 3 < 2 THEN 'working' ELSE 'idle' END"


@register(
    "udf_python_scalar",
    sql=f"""
    SELECT user_id, {_CLASSIFY_SQL} AS status, COUNT(*) AS cnt
    FROM events GROUP BY user_id
    """,
)
def udf_python_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Row-at-a-time Python UDF — the declared slow path."""

    @udf(returnType="string")
    def classify(uid: int) -> str:
        return "working" if uid % 3 < 2 else "idle"

    ev = T(spark, sf, "events")
    return ev.groupBy("user_id").agg(F.count("*").alias("cnt")).select(
        "user_id", classify("user_id").alias("status"), "cnt"
    )


@register(
    "udf_pandas_scalar",
    sql=f"""
    SELECT user_id, {_CLASSIFY_SQL} AS status, COUNT(*) AS cnt
    FROM events GROUP BY user_id
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Same classifier, Arrow-vectorized: one pandas batch per task
    instead of one Python call per row."""

    @pandas_udf("string")
    def classify(uid: pd.Series) -> pd.Series:
        return (uid % 3 < 2).map({True: "working", False: "idle"})

    ev = T(spark, sf, "events")
    return ev.groupBy("user_id").agg(F.count("*").alias("cnt")).select(
        "user_id", classify("user_id").alias("status"), "cnt"
    )


@register(
    "udaf_pandas_grouped",
    sql="""
    SELECT event_type,
           ROUND(EXP(AVG(LN(value))) * 1e6) / 1e6 AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: geometric mean of event value over its
    defined domain (value > 0, filtered identically on both sides —
    at sf0.1 the fixture contains a zero value, on which DuckDB's LN
    raises and numpy silently yields -inf: an asymmetric failure a
    domain filter turns into an agreed contract). NOTE the scale
    caveat: a grouped-agg pandas UDF materializes each group in one
    executor's memory (no partial aggregation) — fine for bounded
    groups, wrong for skewed billion-row keys; there you'd decompose
    (exp∘avg∘ln is exactly that decomposition, shown in the oracle)."""
    import numpy as np

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    ev = T(spark, sf, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        dround(geo_mean("value"), 6).alias("geo_mean")
    )


@register(
    "udtf_tokenize",
    sql="""
    SELECT doc_id,
           UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def udtf_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 Python UDTF (one input row → N output rows), the UDF-side
    dual of fn_explode."""

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for tok in text.split(" "):
                yield doc_id, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 0).createOrReplaceTempView(
        "docs_udtf_v"
    )
    return spark.sql(
        "SELECT t.doc_id, t.token FROM docs_udtf_v v, "
        "LATERAL tokenize_udtf(v.doc_id, v.text) t"
    )


@register(
    "udf_pandas_iter",
    sql=f"""
    SELECT user_id, {_CLASSIFY_SQL} AS status, COUNT(*) AS cnt
    FROM events GROUP BY user_id
    """,
)
def udf_pandas_iter(spark: SparkSession, sf: str) -> DataFrame:
    """SCALAR_ITER pandas UDF (Iterator[Series] → Iterator[Series]):
    same classifier, but per-task setup runs ONCE before the batch loop
    instead of once per batch — the shape that matters at 100 TB when
    the setup is loading a tokenizer/model onto the executor. The
    mapping dict below stands in for that expensive init."""

    @pandas_udf("string")
    def classify(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        mapping = {True: "working", False: "idle"}  # per-task init, amortized
        for uid in batches:
            yield (uid % 3 < 2).map(mapping)

    ev = T(spark, sf, "events")
    return ev.groupBy("user_id").agg(F.count("*").alias("cnt")).select(
        "user_id", classify("user_id").alias("status"), "cnt"
    )


@register(
    "udf_map_in_arrow",
    sql="""
    SELECT UPPER(event_type) AS et, COUNT(*) AS cnt
    FROM events GROUP BY UPPER(event_type)
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """mapInArrow: the zero-copy batch escape hatch — the Python
    function sees raw pyarrow RecordBatches (no pandas conversion
    cost), the right interface when the kernel is itself Arrow-native
    (tokenizers, Arrow-compute string ops, FFI libraries). Column
    pruning still applies: only event_type crosses the boundary."""
    import pyarrow as pa

    def upper_batches(batches):
        import pyarrow.compute as pc

        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [pc.utf8_upper(b.column(0))], names=["et"]
            )

    ev = T(spark, sf, "events").select("event_type")
    upped = ev.mapInArrow(upper_batches, "et string")
    return upped.groupBy("et").agg(F.count("*").alias("cnt"))


@register(
    "udf_arrow_scalar",
    sql=f"""
    SELECT user_id, {_CLASSIFY_SQL} AS status, COUNT(*) AS cnt
    FROM events GROUP BY user_id
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 Arrow-optimized Python UDF (useArrow=True): keeps the
    per-row Python signature but ships batches over Arrow instead of
    pickled rows — the drop-in acceleration for legacy row UDFs that
    can't be rewritten as pandas_udf. Completes the performance ladder
    (row-pickle → arrow-row → pandas-batch)."""

    @udf(returnType="string", useArrow=True)
    def classify(uid: int) -> str:
        return "working" if uid % 3 < 2 else "idle"

    ev = T(spark, sf, "events")
    return ev.groupBy("user_id").agg(F.count("*").alias("cnt")).select(
        "user_id", classify("user_id").alias("status"), "cnt"
    )
