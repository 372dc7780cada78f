"""Read-volume evidence for stream_dedup_cascade's bucketed ledgers.

Runs the cascade at several corpus sizes with a FIXED micro-batch size
(the trickle-ingest regime the incremental design targets: each batch
is small relative to the accumulated ledger), and records — via the
engine's _DC_READ_PROBE hook — how many ledger rows each batch's
PRUNED reads actually scanned vs the ledger's total size.

The claim under test (VERDICT r10 task 1): per-batch ledger read volume
tracks the BATCH, not the corpus — at 10x the corpus (10x the batches,
same batch size) the mean rows scanned per batch stays flat while the
final ledger is 10x larger. Without partition pruning every batch would
scan the whole accumulated ledger (the pre-r11 shape).

r12 additions measured here: per-batch rows surviving the pruned reads
now ALSO reflect the dynamic IN filter (only rows that can equi-join
the batch survive the scan), and the h_files_max/b_files_max columns
show files/bucket BOUNDED by the threshold compaction while the batch
count grows — without compaction a bucket accumulates one file per
touching batch and the pruned reads pay O(batches) listing/footers.

Scale-model knobs (patched here, not in production):
- _DC_FILES is set per SF so every batch is ~BATCH_ROWS docs; the
  replay fixture path encodes the slice count so re-slicing is safe.
- _DC_LEDGER_TARGET_ROWS is shrunk so B > batch at these tiny SFs,
  modeling the production regime where the ledger dwarfs the batch
  (the default 2048 keeps B at the floor of 8 at sf0.01/sf0.1 —
  ~1.3k/12.5k docs — so a 125-doc batch touches every bucket, which
  demonstrates nothing; at sf1x and beyond B grows past the floor).

Each run's funnel is ALSO value-checked against the DuckDB oracle at
the patched slice count (the oracle derives batch boundaries from
_DC_FILES at call time), so the measurement never drifts from the
pinned semantics.

Usage: python tools/cascade_scale.py [--batch-rows 125]
Prints one JSON line per SF plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-rows", type=int, default=125)
    ap.add_argument(
        "--sfs", default="/root/testdata/sf0.01,/root/testdata/sf0.1"
    )
    args = ap.parse_args()

    import engine.streaming as S
    from engine.session import get_spark, table_rows
    from tests.conftest import make_duck
    from tests.oracle_utils import compare

    spark = get_spark()
    S._DC_LEDGER_TARGET_ROWS = 4  # scale model: keep B > batch (see top)
    results = []
    for sf in args.sfs.split(","):
        n = table_rows(sf, "documents")
        S._DC_FILES = max(2, -(-n // args.batch_rows))
        probe: list[dict] = []
        S._DC_READ_PROBE = probe
        try:
            df = S.stream_dedup_cascade(spark, sf)
            # pin semantics at the patched slice count
            compare(df, make_duck(sf), S._dc_oracle_sql(), key="cascade")
        finally:
            S._DC_READ_PROBE = None
        # steady state = batches with a non-empty ledger (skip batch 0)
        steady = [r for r in probe if r["h_ledger"] > 0]
        if not steady:
            # a corpus too small for any post-ledger batch (e.g. 2
            # batches where batch 0 appends nothing) has no steady
            # state to average — emit the run shape and skip the means
            # (ADVICE r11: the mean would divide by zero)
            print(json.dumps({"sf": sf, "docs": n, "batches": len(probe),
                              "steady_batches": 0, "oracle": "match"}),
                  flush=True)
            continue
        h_scan = [r["h_scanned"] for r in steady]
        b_scan = [r["b_scanned"] for r in steady]
        row = {
            "sf": sf,
            "docs": n,
            "batches": len(probe),
            "batch_rows": args.batch_rows,
            "h_ledger_final": probe[-1]["h_ledger"],
            "h_scanned_mean": round(sum(h_scan) / len(h_scan), 1),
            "h_scanned_max": max(h_scan),
            "b_ledger_final": probe[-1]["b_ledger"],
            "b_scanned_mean": round(sum(b_scan) / len(b_scan), 1),
            "b_scanned_max": max(b_scan),
            "h_files_max": max(r["h_files_max"] for r in probe),
            "b_files_max": max(r["b_files_max"] for r in probe),
            "compactions": sum(r["compacted"] for r in probe),
            "oracle": "match",
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    if len(results) >= 2:
        a, z = results[0], results[-1]
        print(
            json.dumps(
                {
                    "summary": "per-batch scanned rows vs ledger growth",
                    "ledger_growth_h": round(
                        z["h_ledger_final"] / max(1, a["h_ledger_final"]), 2
                    ),
                    "scan_growth_h": round(
                        z["h_scanned_mean"] / max(1.0, a["h_scanned_mean"]), 2
                    ),
                    "ledger_growth_b": round(
                        z["b_ledger_final"] / max(1, a["b_ledger_final"]), 2
                    ),
                    "scan_growth_b": round(
                        z["b_scanned_mean"] / max(1.0, a["b_scanned_mean"]), 2
                    ),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
