"""Multimodal columns (SURVEY.md §2 Table D `multimodal_struct` + the
driver's extension surface): image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions over
mapInPandas.

Round 3: the image and audio kernels are REAL. The media table
synthesizes genuine 24-bit BMP images and 16-bit PCM WAV audio
(deterministic content per doc_id), and the decode kernels actually
parse those formats — struct-unpacked headers, numpy pixel/PCM decode,
true luma pHash (32×32 block-average → 2-D DCT-II → median sign bits).
Nothing but stdlib + numpy, so it runs in this container. Only the
VIDEO path keeps a stub (`_FAKE_FRAME_BYTES`): an mp4 codec genuinely
needs ffmpeg — swap `_fake_frame_count` for an av/ffprobe call and
nothing else changes.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
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


# --- real media synthesis ---------------------------------------------------
# The testdata has no binary table, so the media table GENERATES real
# format bytes deterministically from doc_id. The generators are the
# write side of the same formats the kernels decode — a full round trip.


def _make_bmp(doc_id: int) -> bytes:
    """A real 24-bit uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER
    + bottom-up BGR rows padded to 4 bytes. Pixel content is a
    deterministic per-doc gradient+stripe pattern (same doc_id → same
    image; doc_id % 16 aliases → planted duplicate groups for the pHash
    dedup key)."""
    w = 16 + (doc_id % 16) * 3
    h = 16 + ((doc_id % 16) * 7) % 24
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    x = np.arange(w, dtype=np.uint32)
    y = np.arange(h, dtype=np.uint32)[:, None]
    k = doc_id % 16
    b_ = ((x * 255) // max(w - 1, 1) + k * 11).astype(np.uint8)
    g = ((y * 255) // max(h - 1, 1) + k * 7).astype(np.uint8)
    r = (((x[None, :] + y) % 16) * 16 + k).astype(np.uint8)
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = b_[None, :]
    px[:, :, 1] = np.broadcast_to(g, (h, w))
    px[:, :, 2] = r
    rows = [px[i].tobytes() + b"\0" * pad for i in range(h)]
    return header + info + b"".join(rows)


def _make_wav(doc_id: int) -> bytes:
    """A real 16-bit mono PCM WAV (stdlib `wave` writer): a sine at a
    doc-dependent frequency and duration — genuinely decodable audio."""
    sr = 8000
    freq = 200.0 + (doc_id % 20) * 40.0
    n = int(sr * (0.05 + (doc_id % 5) * 0.025))
    t = np.arange(n, dtype=np.float64) / sr
    samples = (np.sin(2 * np.pi * freq * t) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


_FAKE_FRAME_BYTES = 64  # video stub: "frame" = 64-byte slice (no codec in env)


def _gen_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = []
        for doc_id, mime in zip(pdf["doc_id"], pdf["mime"]):
            if mime == "image/bmp":
                payloads.append(_make_bmp(int(doc_id)))
            elif mime == "audio/wav":
                payloads.append(_make_wav(int(doc_id)))
            else:  # video/mp4 — opaque stand-in bytes (see module docstring)
                payloads.append(bytes((int(doc_id) + i) % 251 for i in range(512)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "payload": payloads,
                "lang": pdf["lang"],
                "source": pdf["source"],
            }
        )


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """The multimodal source shape: opaque binary payload + typed
    metadata, payloads generated as REAL format bytes (BMP/WAV) per
    doc_id. Downstream operators treat payload as opaque binary."""
    from engine.session import parallelize_scan, scan_units

    # single-row-group local scan would feed ONE Python worker; at
    # cluster scale the scan is already parallel and this is a no-op
    d = parallelize_scan(
        T(spark, sf, "documents"), scan_units(sf, "documents")
    ).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/bmp")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        "lang",
        "source",
    )
    return d.mapInPandas(
        _gen_media_batches,
        schema="doc_id long, mime string, payload binary, lang string, source string",
    )


# --- real decode kernels ----------------------------------------------------

REAL_DECODE_AVAILABLE = True  # BMP + WAV decode genuinely implemented below


def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a 24-bit uncompressed BMP: header offsets per the format
    spec, bottom-up padded BGR rows → (width, height, luma[h,w] float)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bit depth {bpp}")
    row = w * 3
    stride = row + (4 - row % 4) % 4
    raw = np.frombuffer(payload, dtype=np.uint8, offset=data_off, count=stride * h)
    px = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)[::-1]  # bottom-up
    luma = 0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]
    return w, h, luma


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse PCM WAV via the stdlib reader → (sample_rate, float samples
    in [-1, 1])."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        samples = np.frombuffer(wf.readframes(n), dtype="<i2").astype(np.float64)
    return sr, samples / 32768.0


def _resample(luma: np.ndarray, out: int) -> np.ndarray:
    """Resample luma to out×out by nearest-neighbor index mapping — the
    resize step of pHash without PIL; works for images smaller OR larger
    than the target grid, fully deterministic."""
    h, w = luma.shape
    yi = (np.arange(out) * h // out).clip(0, h - 1)
    xi = (np.arange(out) * w // out).clip(0, w - 1)
    return luma[np.ix_(yi, xi)]


_DCT32 = np.cos(np.pi / 32 * (np.arange(32)[:, None] + 0.5) * np.arange(32)[None, :])


def _phash64(luma: np.ndarray) -> int:
    """Real perceptual hash: 32×32 resample → 2-D DCT-II (numpy
    matmul against the cosine basis) → top-left 8×8 coefficients (minus
    DC) → sign-vs-median bits packed into a signed 64-bit int."""
    g = _resample(luma, 32)
    d = _DCT32.T @ g @ _DCT32
    block = d[:8, :8].flatten()
    med = np.median(block[1:])
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one out. Column access is
    vectorized; the per-blob decode is a Python loop over a REAL header
    parse + numpy pixel decode — exactly the shape a PIL/libvips kernel
    has."""
    for pdf in batches:
        dims = [_decode_bmp(p)[:2] for p in pdf["payload"]]
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


@register(
    "multimodal_decode",
    # Full value oracle (r4): the BMP generator is a pure function of
    # doc_id (w = 16 + k*3, h = 16 + (k*7)%24, k = doc_id%16; file size
    # = 54-byte headers + 4-padded BGR rows), so the oracle recomputes
    # every column from the generator SPEC while the Spark side parses
    # the actual bytes — a genuine independent check of the decode path
    # (wrong data offset, stride, or bottom-up handling all mismatch).
    # Thumbnail = identity here: both dims < 256 so the scale clips to 1.
    sql="""
    SELECT doc_id, 'image/bmp' AS mime,
           CAST(54 + (w * 3 + (4 - (w * 3) % 4) % 4) * h AS BIGINT) AS n_bytes,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(w AS INT) AS thumb_w, CAST(h AS INT) AS thumb_h
    FROM (SELECT doc_id,
                 16 + (doc_id % 16) * 3 AS w,
                 16 + ((doc_id % 16) * 7) % 24 AS h
          FROM documents WHERE doc_id % 3 = 0) t
    """,
)
def multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Decode + resize pipeline over the binary column via mapInPandas —
    REAL BMP header/pixel decode (module docstring). Repartitioned by
    doc_id first: at 100 TB blobs dominate row size, so decode
    parallelism must follow blob count, not input file splits."""
    media = media_table(spark, sf).filter(F.col("mime") == "image/bmp")
    return (
        media.repartition("doc_id")
        .select("doc_id", "mime", "payload")
        .mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
    )


@register(
    "multimodal_frames",
    # Full value oracle (r4): video payloads are the 512-byte stub, so
    # every clip has 512/64 = 8 frames and the every-4th sampler emits
    # exactly (sample_idx, frame_no) = (0,0),(1,4) per video doc.
    sql="""
    SELECT doc_id, CAST(u.i AS INT) AS sample_idx, CAST(u.i * 4 AS INT) AS frame_no
    FROM documents, UNNEST(GENERATE_SERIES(0, 1)) AS u(i)
    WHERE doc_id % 3 = 2
    """,
)
def multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling for the video rows: every k-th 'frame' (here: a
    64-byte slice standing in for a decoded frame — mp4 needs ffmpeg,
    see module docstring) exploded to one row per sampled frame — the
    fan-out shape of real video pipelines, where the explode must happen
    AFTER filtering to the wanted media type."""
    media = media_table(spark, sf).filter(F.col("mime") == "video/mp4")
    n_frames = (F.length("payload") / _FAKE_FRAME_BYTES).cast("int")
    return (
        media.select(
            "doc_id",
            F.posexplode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(4))
            ).alias("sample_idx", "frame_no"),
        )
        .select("doc_id", "sample_idx", "frame_no")
    )


def _audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for audio feature extraction — REAL WAV parse:
    stdlib wave reader + numpy PCM decode, true duration/RMS/zero-
    crossing rate per clip."""
    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            sr, s = _decode_wav(p)
            rms = float(np.sqrt(np.mean(s * s))) if len(s) else 0.0
            zcr = float(np.mean(np.abs(np.diff(np.signbit(s))))) if len(s) > 1 else 0.0
            rows.append(
                (doc_id, round(len(s) / sr, 4), round(rms, 4), round(zcr, 4), len(p))
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "duration_s", "rms", "zcr", "n_bytes"]
        )


@register(
    "multimodal_audio_features",
    # Full value oracle (r4): the WAV generator synthesizes a sine whose
    # frequency/length are pure functions of doc_id, so the oracle
    # REGENERATES the identical int16 sample stream in SQL (DuckDB SIN
    # reproduces numpy's bit-for-bit at this rounding — verified over
    # all 20 (freq, n) combos) and recomputes duration/RMS/ZCR/bytes
    # from first principles, while the Spark side parses the actual WAV
    # bytes. 44 = RIFF+fmt+data header bytes; TRUNC mirrors .astype(i2)
    # truncation toward zero.
    sql="""
    WITH p AS (
      SELECT doc_id,
             200.0 + (doc_id % 20) * 40.0 AS freq,
             400 + (doc_id % 5) * 200 AS n
      FROM documents WHERE doc_id % 3 = 1
    ),
    samp AS (
      SELECT p.doc_id, p.n, u.i AS i,
             CAST(TRUNC(SIN(2 * PI() * p.freq * (u.i / 8000.0)) * 12000)
                  AS SMALLINT) AS s
      FROM p, UNNEST(GENERATE_SERIES(0, p.n - 1)) AS u(i)
    ),
    f AS (
      SELECT doc_id, n, i, s / 32768.0 AS v,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM samp
    )
    SELECT doc_id,
           ROUND(ANY_VALUE(n) / 8000.0, 4) AS duration_s,
           ROUND(SQRT(AVG(v * v)), 4) AS rms,
           ROUND(AVG(CASE WHEN prev IS NULL THEN NULL
                          WHEN (v < 0) <> (prev < 0) THEN 1.0
                          ELSE 0.0 END), 4) AS zcr,
           CAST(44 + 2 * ANY_VALUE(n) AS BIGINT) AS n_bytes
    FROM f GROUP BY doc_id
    """,
)
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
            schema="doc_id long, duration_s double, rms double, zcr double, n_bytes long",
        )
    )


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for perceptual hashing — the REAL pHash
    pipeline: BMP decode → luma → 32×32 block-average → DCT-II → median
    sign bits (see _phash64)."""
    for pdf in batches:
        hashes = [_phash64(_decode_bmp(p)[2]) for p in pdf["payload"]]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})


@register(
    "multimodal_phash_dedup",
    # Fixture oracle (r4): image content is a pure function of
    # doc_id % 16, so pHash buckets must be EXACTLY the planted %16
    # groups — the oracle rebuilds that grouping relationally. This
    # verifies both directions of the hash's discrimination (identical
    # images collide; all 16 distinct patterns produce 16 distinct
    # hashes — a degenerate kernel that hashed everything equal, or
    # split equal bytes apart, mismatches). The raw 64-bit hash value
    # is kernel-internal and not part of the comparison surface.
    sql="""
    SELECT MIN(doc_id) AS rep_doc, COUNT(*) AS n_docs,
           STRING_AGG(doc_id::VARCHAR, ',' ORDER BY doc_id) AS docs
    FROM documents WHERE doc_id % 3 = 0
    GROUP BY doc_id % 16 HAVING COUNT(*) > 1
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash dedup over the binary media column: real pHash
    per blob (Arrow-batched mapInPandas), then bucket groupBy on the
    64-bit hash; buckets with >1 doc are duplicate candidates (the
    generator aliases doc_id % 16 → planted duplicate groups, so the
    buckets are value-checked against that fixture — see oracle note).
    The image analogue of dedup_simhash: at 100 TB the hash pass is
    narrow (no shuffle), and the only shuffle moves (doc_id, phash)
    pairs — never the blobs themselves."""
    media = media_table(spark, sf).filter(F.col("mime") == "image/bmp")
    hashed = media.repartition("doc_id").mapInPandas(
        _phash_batches, "doc_id long, phash long"
    )
    return (
        hashed.groupBy("phash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_arr"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            F.element_at("doc_arr", 1).alias("rep_doc"),
            "n_docs",
            F.concat_ws(
                ",", F.transform("doc_arr", lambda x: x.cast("string"))
            ).alias("docs"),
        )
        .orderBy("rep_doc")
    )
