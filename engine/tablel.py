"""Round-7 wave (SURVEY.md §2 Table L): batched-inference embedding
plumbing — the `fn_ai_embed` shape a 100 TB training-data platform runs
to vectorize a corpus against a model server, plus its incremental
(cache-aware) variant.

Scale design notes (100 TB posture):
- the encoder rides `mapInPandas` with the ITERATOR signature: per-task
  model/session init runs ONCE (the udf_pandas_iter contract), Arrow
  moves batches zero-copy-ish, and the client re-chunks every incoming
  Arrow batch into bounded ≤64-row requests — the max-batch-size limit
  every real inference endpoint imposes. Only (doc_id, text) crosses
  the Python boundary (column pruning applies before the map).
- the MODEL ITSELF is a deterministic stub (portable md5-derived
  components in exact integer micro-units): the container has no
  model runtime, so the swap-in point `_stub_encode` stands in for the
  HTTP/gRPC call — the Spark-side plumbing (schema, batching, partition
  fan-out, downstream aggregation) is real and value-checked end-to-end
  because DuckDB rebuilds the identical vectors.
- incremental variant: the corpus anti-joins the already-embedded
  store on the document key BEFORE any Python runs — at 100 TB the
  win is not calling the model at all on the 95% already served; one
  keyed equi-join (broadcast when the store fits, shuffle otherwise),
  never a rescan of embedded content through the encoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import register
from engine.session import T

_EMB_DIM = 8
_EMB_MOD = 1_000_000
_CLIENT_BATCH = 64  # max request size the "endpoint" accepts

#: shared DuckDB expression for one stub-embedding component list —
#: the exact function _stub_encode computes per row (proves the whole
#: batched path value-identical, not just row counts)
_EMB_LIST_SQL = (
    "LIST_TRANSFORM(GENERATE_SERIES(0, "
    f"{_EMB_DIM - 1}), d -> ('0x' || substr(md5('embed:' || text || ':' || "
    f"CAST(d AS VARCHAR)), 1, 15))::BIGINT % {_EMB_MOD})"
)


def _stub_encode(text: str) -> list[int]:
    """Deterministic stand-in for a model-server embed call: component
    d = portable 60-bit md5 hash of (text, d) in integer micro-units.
    A production deployment replaces THIS function with the endpoint
    client; everything around it (batching, Arrow transfer, schema,
    downstream joins/aggs) is unchanged."""
    import hashlib

    return [
        int(hashlib.md5(f"embed:{text}:{d}".encode()).hexdigest()[:15], 16)
        % _EMB_MOD
        for d in range(_EMB_DIM)
    ]


def _encode_map_in_pandas(df: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, emb array<long>, emb_sum long) through
    the batched-inference plumbing: iterator mapInPandas (per-task init
    amortized), client-side re-chunk to ≤_CLIENT_BATCH-row requests."""

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # per-task "model load" happens here, once, before the loop
        encode = _stub_encode
        for pdf in batches:
            for start in range(0, len(pdf), _CLIENT_BATCH):
                req = pdf.iloc[start : start + _CLIENT_BATCH]
                embs = [encode(t) for t in req["text"]]
                yield pd.DataFrame(
                    {
                        "doc_id": req["doc_id"].values,
                        "emb": embs,
                        "emb_sum": [sum(e) for e in embs],
                    }
                )

    return df.select("doc_id", "text").mapInPandas(
        encode_batches, "doc_id long, emb array<long>, emb_sum long"
    )


_EMBED_BATCH_SQL = f"""
    SELECT doc_id, ARRAY_TO_STRING(emb, ',') AS emb,
           CAST(LIST_SUM(emb) AS BIGINT) AS emb_sum
    FROM (SELECT doc_id, {_EMB_LIST_SQL} AS emb FROM documents)
"""


@register("pipeline_embed_batch", sql=_EMBED_BATCH_SQL)
def pipeline_embed_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vectorization through a batched inference endpoint — the
    `fn_ai_embed` primitive: every document flows through the iterator
    mapInPandas encoder (per-task model init, Arrow batch transfer,
    ≤64-row client requests) and comes back as an exact-integer
    micro-unit vector plus its component sum (the cheap norm-proxy a
    quality monitor tracks). The stub model is deterministic md5, so
    the oracle rebuilds every vector component bit-for-bit — the
    strongest possible check of the plumbing (a dropped row, a
    reordered batch, a mis-mapped column all change the hash). The
    vector leaves the query as a comma-joined string: result columns
    must be scalar-typed (see engine.canon.joined — the driver's
    pandas canonicalizer cannot sort list columns; r7's one ERR).
    Scale: one narrow projection into Python, no shuffle at all;
    encoding parallelism is exactly the scan parallelism."""
    from engine.canon import joined

    return _encode_map_in_pandas(T(spark, sf, "documents")).select(
        "doc_id", joined(F.col("emb")).alias("emb"), "emb_sum"
    )


_EMBED_INCR_SQL = f"""
    WITH store AS (SELECT vec_id FROM embeddings WHERE vec_id % 3 <> 0),
    d AS (
      SELECT doc_id, source, text,
             doc_id IN (SELECT vec_id FROM store) AS hit
      FROM documents
    ),
    m AS (
      SELECT doc_id, source,
             CAST(LIST_SUM({_EMB_LIST_SQL}) AS BIGINT) AS emb_sum
      FROM d WHERE NOT hit
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_cached,
           CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_embedded,
           CAST(COALESCE(SUM(m.emb_sum), 0) AS BIGINT) AS emb_sum
    FROM d LEFT JOIN m ON d.doc_id = m.doc_id
    GROUP BY d.source ORDER BY d.source
"""


@register("pipeline_embed_incremental", sql=_EMBED_INCR_SQL)
def pipeline_embed_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental (cache-aware) corpus embedding — the production form
    of pipeline_embed_batch: documents already present in the embedding
    store (here: embeddings.vec_id with a deterministic ⅓ backfill gap,
    simulating a partially-complete prior run) are NOT re-encoded; only
    the anti-join survivors flow through the batched encoder. Reports
    per-source hit/miss counts plus the exact component sum over the
    freshly-embedded set — an integer that is only right if the encoder
    ran on EXACTLY the miss set (re-embedding a hit or dropping a miss
    both change it). Scale: the hit/miss split is ONE keyed equi-join
    before any Python; the encoder cost tracks the miss rate, not the
    corpus."""
    docs = T(spark, sf, "documents").select("doc_id", "source", "text")
    store = (
        T(spark, sf, "embeddings")
        .select("vec_id")
        .filter(F.col("vec_id") % 3 != 0)
    )
    hit_flag = docs.join(
        store, docs["doc_id"] == store["vec_id"], "left"
    ).select("doc_id", "source", "text", F.col("vec_id").isNotNull().alias("hit"))
    misses = hit_flag.filter(~F.col("hit")).select("doc_id", "text")
    embedded = _encode_map_in_pandas(misses).select("doc_id", "emb_sum")
    joined = hit_flag.join(embedded, "doc_id", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_cached"),
            F.sum(F.when(F.col("hit"), 0).otherwise(1))
            .cast("long")
            .alias("n_embedded"),
            F.coalesce(F.sum("emb_sum"), F.lit(0)).cast("long").alias("emb_sum"),
        )
        .orderBy("source")
    )
