"""Planted-fixture and plan-shape tests for the Table L ops
(engine/tablel.py): batched-inference embedding plumbing. The oracle
pre-flight proves Spark ≡ DuckDB; these prove the intended semantics
(the stub encoder is the md5 spec, the incremental path encodes exactly
the miss set) and the 100 TB plan shape (no shuffle into the encoder,
cache split before any Python)."""

from __future__ import annotations

import hashlib
import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from engine.registry import all_queries
from engine.tablel import _CLIENT_BATCH, _EMB_DIM, _EMB_MOD, _stub_encode

from .conftest import SF_SMOKE

QUERIES = all_queries()


def _plan(spark, key: str) -> str:
    df = QUERIES[key](spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _write(spark, tmp_path, table, df) -> str:
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/{table}.parquet")
    return sf_dir


def _ref_embed(text: str) -> list[int]:
    return [
        int(hashlib.md5(f"embed:{text}:{d}".encode()).hexdigest()[:15], 16)
        % _EMB_MOD
        for d in range(_EMB_DIM)
    ]


def test_embed_batch_matches_spec_and_covers_corpus(spark, tmp_path):
    docs = [(i, f"document body {i}", "en", "web", 20) for i in range(150)]
    sf = _write(spark, tmp_path, "documents", _docs_df(spark, docs))
    got = {r["doc_id"]: r for r in QUERIES["pipeline_embed_batch"](spark, sf).collect()}
    assert len(got) == 150  # > _CLIENT_BATCH: re-chunking must not drop rows
    assert len(got) > _CLIENT_BATCH
    for i in (0, 64, 149):  # batch-boundary rows included
        want = _ref_embed(f"document body {i}")
        # emb leaves the query comma-joined (scalar-column contract;
        # the driver's canonicalizer cannot sort list columns)
        assert got[i]["emb"] == ",".join(str(c) for c in want)
        assert got[i]["emb_sum"] == sum(want)
    # module stub agrees with the local spec
    assert _stub_encode("document body 0") == _ref_embed("document body 0")


def test_embed_incremental_encodes_exactly_the_miss_set(spark, tmp_path):
    # store = vec_id % 3 != 0 over vec_ids 0..9; docs 0..11.
    # hits: doc_id in {1,2,4,5,7,8}; misses: {0,3,6,9} (in store-gap)
    # plus {10,11} (beyond the store).
    docs = [(i, f"t{i}", "en", "web" if i % 2 == 0 else "book", 2) for i in range(12)]
    sf = _write(spark, tmp_path, "documents", _docs_df(spark, docs))
    emb = spark.createDataFrame(
        [(i, [0.0] * 4, 0) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    emb.coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    rows = {r["source"]: r for r in QUERIES["pipeline_embed_incremental"](spark, sf).collect()}
    # web = even doc_ids 0,2,4,6,8,10 -> hits {2,4,8}, misses {0,6,10}
    assert (rows["web"]["n_docs"], rows["web"]["n_cached"], rows["web"]["n_embedded"]) == (6, 3, 3)
    assert rows["web"]["emb_sum"] == sum(sum(_ref_embed(f"t{i}")) for i in (0, 6, 10))
    # book = odd doc_ids 1,3,5,7,9,11 -> hits {1,5,7}, misses {3,9,11}
    assert (rows["book"]["n_docs"], rows["book"]["n_cached"], rows["book"]["n_embedded"]) == (6, 3, 3)
    assert rows["book"]["emb_sum"] == sum(sum(_ref_embed(f"t{i}")) for i in (3, 9, 11))


def test_embed_batch_no_shuffle_into_encoder(spark):
    # full-corpus encode is scan -> project -> MapInPandas: no Exchange
    # anywhere (encoding parallelism = scan parallelism)
    p = _plan(spark, "pipeline_embed_batch")
    assert "MapInPandas" in p, p
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p, p


def test_embed_incremental_splits_before_python(spark):
    # the anti-join side feeding the encoder must appear below the
    # MapInPandas node: only misses cross into Python
    p = _plan(spark, "pipeline_embed_incremental")
    assert "MapInPandas" in p, p
    head, _, below = p.partition("MapInPandas")
    assert "Join" in below, p  # the hit/miss join runs before the encoder
    assert "BatchEvalPython" not in p, p
