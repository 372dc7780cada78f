"""Synthesize a 10x blow-up of the event/document/embedding tables.

The sf1-readiness protocol (SCALE.md): testdata tops out at sf0.1, so
the decade-further scaling evidence comes from a SYNTHETIC 10x replica
of the three non-TPC-H tables, written to .scratch/sf1x/. Replication
is cardinality-growing, not density-growing: replica i shifts every id
column by i * (max_id + 1), so there are 10x users / documents /
vectors with the SAME per-key event density, per-doc length, and value
distributions — the "more traffic, same behavior" axis a production
pipeline scales along. Timestamps are left unchanged (event RATE grows
10x over the same horizon). TPC-H tables are byte-copied so every
loader finds its full schema; keys that read only those tables are NOT
valid subjects at sf1x (their input did not scale).

Deterministic end-to-end: no RNG, same bytes on every run.

``--family orders`` (r10) writes the OTHER axis to .scratch/sf1xo/:
10x customer/orders/lineitem with FK-consistent shifts (o_custkey
moves by the CUSTOMER pk offset, l_orderkey by the ORDERS pk offset,
so every replica's joins resolve exactly like the original's), while
part/supplier stay copied — replicas order from the same catalog,
the realistic "more transactions, same products" densification.
events/documents/embeddings are byte-copied there.

Usage: python tools/make_sf1x.py [--src /root/testdata/sf0.1]
                                 [--factor 10] [--family default|orders]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALED = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)


def _roll_vectors(col: pa.ChunkedArray, shift: int) -> pa.Array:
    """Rotate every embedding's components by ``shift`` positions.

    Exact duplicates are adversarial for the similarity keys (10
    identical copies of a vector all collide into the same LSH/IVF
    bucket, inflating candidate sets quadratically), and these
    embeddings are measured-isotropic (BASELINE.md OPQ finding:
    |corr|≈0.03 between dimensions, variances uniform), so a component
    rotation preserves the distribution exactly while making every
    replica a distinct vector. Deterministic: replica i rolls by i."""
    import numpy as np

    arr = col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
    else:
        lens = pc.list_value_length(arr)
        lo, hi = pc.min(lens).as_py(), pc.max(lens).as_py()
        if lo != hi:
            raise ValueError(
                f"ragged embedding column (len {lo}..{hi}); rolling a flat "
                "buffer would scramble vectors across rows"
            )
        d = lo
    assert len(flat) == n * d
    if shift % d == 0 and shift != 0:
        raise ValueError(
            f"roll shift {shift} is a multiple of dim {d}: replica would be "
            "an exact duplicate (use --factor <= dim)"
        )
    rolled = np.roll(flat.reshape(n, d), shift, axis=1).ravel()
    return pa.FixedSizeListArray.from_arrays(
        pa.array(rolled, type=arr.type.value_type), d
    ).cast(arr.type) if pa.types.is_fixed_size_list(arr.type) else (
        pa.ListArray.from_arrays(
            pa.array(range(0, (n + 1) * d, d), type=pa.int32()),
            pa.array(rolled, type=arr.type.value_type),
        )
    )


def blow_up(
    src: str,
    table: str,
    id_cols: list[str],
    factor: int,
    offsets: dict[str, int] | None = None,
) -> pa.Table:
    t = pq.read_table(f"{src}/{table}.parquet")
    # strip pandas metadata: the replicas are a new physical table
    t = t.replace_schema_metadata(None)
    if offsets is None:
        offsets = {c: pc.max(t[c]).as_py() + 1 for c in id_cols}
    parts = []
    for i in range(factor):
        if i == 0:
            parts.append(t)
            continue
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name in offsets:
                col = pc.add(col, pa.scalar(i * offsets[name], type=col.type))
            elif table == "embeddings" and name == "embedding":
                # pass i raw: _roll_vectors raises if i wraps to an exact
                # duplicate (i % dim == 0), i.e. factor must be <= dim
                col = _roll_vectors(col, i)
            cols[name] = col
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


#: derived, not hand-listed — a table added to SCALED/COPIED can't be
#: silently missing from the orders-family copy loop (review r10)
ALL_TABLES = COPIED + tuple(SCALED)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--family", choices=("default", "orders"), default="default")
    args = ap.parse_args()

    # Fail-fast UX, not corruption protection: _roll_vectors itself
    # raises at shift == dim (replicas count 1..factor-1, so any
    # factor > dim hits that shift) — but only AFTER events/documents
    # were already written, leaving a partial output dir. Check the
    # invariant up front, from the schema alone when the embedding
    # column is a fixed-size list (no data read), else from one row.
    if args.family == "default" and args.factor > 1:
        epath = f"{args.src}/embeddings.parquet"
        etype = pq.read_schema(epath).field("embedding").type
        if pa.types.is_fixed_size_list(etype):
            dim = etype.list_size
        else:
            batch = next(
                pq.ParquetFile(epath).iter_batches(
                    batch_size=1, columns=["embedding"]
                )
            )
            first = batch.column(0)[0].as_py()
            dim = len(first) if first is not None else 0
        if dim and args.factor > dim:
            ap.error(
                f"--factor {args.factor} exceeds embedding dim {dim}: "
                "the component roll would hit an exact-duplicate shift"
            )

    from engine.session import scratch_dir

    if args.family == "orders":
        out = pathlib.Path(scratch_dir("sf1xo"))
        # FK-consistent shared offsets: every FK moves by its referenced
        # table's PK offset so replica joins resolve like the original's
        maxc = pc.max(pq.read_table(f"{args.src}/customer.parquet")["c_custkey"]).as_py() + 1
        maxo = pc.max(pq.read_table(f"{args.src}/orders.parquet")["o_orderkey"]).as_py() + 1
        plans = {
            "customer": {"c_custkey": maxc},
            "orders": {"o_orderkey": maxo, "o_custkey": maxc},
            # l_partkey / l_suppkey stay unshifted: replicas order from
            # the SAME catalog (the densification axis for part/supplier)
            "lineitem": {"l_orderkey": maxo},
        }
        for table, offs in plans.items():
            t = blow_up(args.src, table, list(offs), args.factor, offsets=offs)
            pq.write_table(t, out / f"{table}.parquet", compression="snappy")
            print(f"{table}: {t.num_rows} rows -> {out}")
        for table in ALL_TABLES:
            if table not in plans:
                shutil.copyfile(
                    f"{args.src}/{table}.parquet", out / f"{table}.parquet"
                )
        print(f"done: {out}")
        return

    out = pathlib.Path(scratch_dir("sf1x"))
    for table, id_cols in SCALED.items():
        dst = out / f"{table}.parquet"
        t = blow_up(args.src, table, id_cols, args.factor)
        pq.write_table(t, dst, compression="snappy")
        print(f"{table}: {t.num_rows} rows -> {dst}")
    for table in COPIED:
        shutil.copyfile(f"{args.src}/{table}.parquet", out / f"{table}.parquet")
    print(f"done: {out}")


if __name__ == "__main__":
    main()
