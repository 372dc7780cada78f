"""Multimodal columns (SURVEY.md §2 Table D `multimodal_struct` + the
driver's extension surface): image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions over
mapInPandas.

The container has no image/audio libraries, so the actual byte decoding
is STUBBED with a deterministic fake (clearly marked below); everything
Spark-side — binary column handling, metadata struct schema, the
mapInPandas batch shape, partitioning — is real and tested. Swap
`_fake_decode` for a PIL/ffmpeg call and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.canon import dround
from engine.registry import register
from engine.session import T


@register(
    "multimodal_struct",
    sql="""
    SELECT d.doc_id,
           to_json(struct_pack(
             lang := d.lang, source := d.source, n_chars := d.n_chars,
             n_tokens := LEN(STRING_SPLIT(d.text, ' ')),
             emb_dim := LEN(e.embedding))) AS meta_json,
           ROUND(e.embedding[1]::DOUBLE * 1e6) / 1e6 AS emb_head
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_struct(spark: SparkSession, sf: str) -> DataFrame:
    """Assemble the typed document record: metadata struct + token stats
    + embedding join, nested output canonicalized via to_json (floats
    kept OUT of the json — engines format them differently)."""
    d = T(spark, sf, "documents")
    e = T(spark, sf, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id)
    meta = F.struct(
        F.col("lang"),
        F.col("source"),
        F.col("n_chars"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.size("embedding").alias("emb_dim"),
    )
    return joined.select(
        "doc_id",
        F.to_json(meta).alias("meta_json"),
        dround(F.col("embedding").getItem(0).cast("double"), 6).alias("emb_head"),
    )


# --- the stubbed decoder ----------------------------------------------------

#: Set True only where a real imaging stack exists; the engine contract
#: (schemas, batching, partitioning) is identical either way.
REAL_DECODE_AVAILABLE = False


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB for image decoding. Deterministic fake dimensions derived
    from the payload bytes; replace with e.g. PIL.Image.open when the
    imaging stack exists."""
    if REAL_DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire a real decoder (PIL/libvips) here")
    n = len(payload)
    return 64 + n % 577, 64 + (n * 7) % 413


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one out. Column access is
    vectorized; only the (stubbed) per-blob decode is a Python loop —
    exactly the shape a real decoder has."""
    for pdf in batches:
        dims = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["payload"].map(len),
                "width": [w for w, _ in dims],
                "height": [h for _, h in dims],
            }
        )
        # "resize": clamp to a 256-max thumbnail box, preserving ratio
        scale = (256.0 / out[["width", "height"]].max(axis=1)).clip(upper=1.0)
        out["thumb_w"] = (out["width"] * scale).round().astype("int32")
        out["thumb_h"] = (out["height"] * scale).round().astype("int32")
        yield out


_DECODE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, "
    "thumb_w int, thumb_h int"
)


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """The multimodal source shape: opaque binary payload + typed
    metadata. Synthesized from documents (no binary testdata table):
    payload = utf8 bytes of text — opaque to everything downstream."""
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.struct(F.col("lang"), F.col("source"), F.col("n_chars")).alias("meta"),
    )


@register("multimodal_decode")  # rows-only: decode is the stubbed fake
def multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Decode + resize pipeline over the binary column via mapInPandas.
    Repartitioned by doc_id first: at 100 TB blobs dominate row size, so
    decode parallelism must follow blob count, not input file splits."""
    media = media_table(spark, sf).filter(F.col("mime") == "image/png")
    return (
        media.repartition("doc_id")
        .select("doc_id", "mime", "payload")
        .mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
    )


@register("multimodal_frames")  # rows-only: frame sampling over the stub
def multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling for the video rows: every k-th 'frame' (here: a
    64-byte slice standing in for a decoded frame) exploded to one row
    per sampled frame — the fan-out shape of real video pipelines, where
    the explode must happen AFTER filtering to the wanted media type."""
    media = media_table(spark, sf).filter(F.col("mime") == "video/mp4")
    n_frames = (F.length("payload") / 64).cast("int")
    return (
        media.select(
            "doc_id",
            F.posexplode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(4)))
            .alias("sample_idx", "frame_no"),
        )
        .select("doc_id", "sample_idx", "frame_no")
    )


def _audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for audio feature extraction. The DSP is the
    stub (deterministic pseudo-features from the byte stream — swap for
    librosa/torchaudio); the batch shape, schema, and vectorized column
    handling are the real contract."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        # STUB: pretend 16kHz 16-bit mono; "rms" from byte-sum fakery
        duration = n_bytes / 32000.0
        rms = pdf["payload"].map(lambda p: (sum(p[:256]) % 1000) / 1000.0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "duration_s": duration.round(4),
                "rms": rms.round(4),
                "n_bytes": n_bytes,
            }
        )


@register("multimodal_audio_features")  # rows-only: stubbed DSP
def multimodal_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Feature extraction over the audio rows (decode → features is the
    other half of the multimodal checklist next to resize/frame-sample):
    filter to the media type FIRST so only audio bytes flow into the
    Python stage."""
    media = media_table(spark, sf).filter(F.col("mime") == "audio/wav")
    return (
        media.repartition("doc_id")
        .select("doc_id", "payload")
        .mapInPandas(
            _audio_feature_batches,
            schema="doc_id long, duration_s double, rms double, n_bytes long",
        )
    )


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for perceptual hashing. A real pHash decodes
    the image, downsamples to 8×8 luma, and takes the DCT sign bits;
    the STUB derives a deterministic 64-bit value from the payload bytes
    (8-byte strides xor-folded) — the batch shape, schema, and the
    per-blob Python loop are exactly what the real kernel has."""
    for pdf in batches:
        hashes = []
        for p in pdf["payload"]:
            h = 0
            for i in range(0, min(len(p), 512), 8):
                h ^= int.from_bytes(p[i : i + 8].ljust(8, b"\0"), "little")
            hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})


@register("multimodal_phash_dedup")  # rows-only: stubbed decode kernel
def multimodal_phash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash dedup over the binary media column: pHash per
    blob (Arrow-batched mapInPandas, decode stubbed — see module
    docstring), then bucket groupBy on the 64-bit hash; buckets with >1
    doc are duplicate candidates. The image analogue of dedup_simhash:
    at 100 TB the hash pass is narrow (no shuffle), and the only shuffle
    moves (doc_id, phash) pairs — never the blobs themselves."""
    media = media_table(spark, sf).filter(F.col("mime") == "image/png")
    hashed = media.repartition("doc_id").mapInPandas(
        _phash_batches, "doc_id long, phash long"
    )
    return (
        hashed.groupBy("phash")
        .agg(
            F.count("*").alias("n_docs"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("docs"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("phash")
    )
