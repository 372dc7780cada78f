"""Per-batch / per-phase profiling of the dedup cascades (guide §1).

Monkeypatches timing around the shared cascade batch body's expensive
internals (_compact_ledger_buckets) and wraps each foreachBatch call via
the _DC_BATCH_WRAPPER test hook, so each batch's wall time is split into
compaction vs the rest. Measurement-only tool; never imported by the
engine.

Usage: python tools/cascade_profile.py [ttl|plain|e2e|decon] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import engine.streaming as st  # noqa: E402
from engine.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "ttl"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("cascade_profile")
    spark.sparkContext.setLogLevel("ERROR")

    compact_t = [0.0]
    orig_compact = st._compact_ledger_buckets

    def timed_compact(*a, **kw):
        t0 = time.perf_counter()
        r = orig_compact(*a, **kw)
        compact_t[0] += time.perf_counter() - t0
        return r

    st._compact_ledger_buckets = timed_compact

    batches: list[float] = []

    def wrapper(fn):
        def inner(df, eid):
            t0 = time.perf_counter()
            fn(df, eid)
            batches.append(time.perf_counter() - t0)

        return inner

    st._DC_BATCH_WRAPPER = wrapper

    fns = {
        "ttl": st.stream_dedup_cascade_ttl,
        "plain": st.stream_dedup_cascade,
        "e2e": st.stream_ingest_e2e,
        "decon": st.stream_decontaminate,
    }
    fn = fns[which]
    for rep in range(reps):
        batches.clear()
        compact_t[0] = 0.0
        t0 = time.perf_counter()
        df = fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        print(
            f"{which} rep{rep}: total={total:.2f}s batches="
            + ",".join(f"{b:.2f}" for b in batches)
            + f" batch_sum={sum(batches):.2f} compact={compact_t[0]:.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
