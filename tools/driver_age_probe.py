"""Driver-state aging probe (optimization guide §1 / §5.4).

Hypothesis under test: the full-registry bench sweep DEGRADES the
driver as it runs — the r13 sweeps read late-alphabet keys (pipeline_*,
project_*, q*, stream_*, text_*) at 2-5x their isolated times even as
the per-key MIN over up to 5 adaptive repeats, while the same keys
measure fast in a fresh session. Candidate mechanism: ~385 keys x 2-5
repeats x ~5-300 Spark jobs each push tens of thousands of jobs /
stages / SQL executions through the AppStatus/SQLAppStatus listeners,
whose in-memory stores retain by default 1000 executions (each holding
the FULL plan graph string — MBs for the iterative-graph keys), 1000
jobs and 100k task rows; driver heap fills, GC time climbs, and every
driver-latency-bound action (micro-batch streaming keys most of all)
pays the tax.

Protocol (everything in ONE process, like the sweep):
  1. fresh session, standard warm-up (tables + one key),
  2. time PROBE_KEYS (min of R repeats) -> "fresh",
  3. AGE: materialize every registered key once at $AGE_SF (default
     sf0.001 — same number of jobs/plans as a sweep pass, tiny data),
  4. time PROBE_KEYS again -> "aged",
  5. report per-key fresh/aged plus driver GC-time and heap deltas.

Run with SPARK_GRAFT_STATUS_HYGIENE=1 to apply the proposed retained-*
caps (see engine/session.py) and compare the aged numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.registry import all_queries  # noqa: E402
from engine.session import TABLES, get_spark, load_table  # noqa: E402

PROBE_KEYS = (
    "stream_stream_join",
    "project_arith",
    "pipeline_seeded_shuffle",
    "text_repetition_ratio",
    "stream_dedup_cascade_ttl",
)
REPEATS = 2


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def gc_ms(spark) -> int:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(b.getCollectionTime() for b in beans)


def heap_mb(spark) -> int:
    mem = spark._jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    return int(mem.getHeapMemoryUsage().getUsed() / 1048576)


def time_probes(spark, queries, sf_dir) -> dict[str, float]:
    out = {}
    for key in PROBE_KEYS:
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            materialize(queries[key](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[key] = round(min(samples), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    age_sf = os.environ.get("AGE_SF", "/root/testdata/sf0.001")
    os.environ.setdefault("SPARK_GRAFT_FAST_HASH", "1")
    spark = get_spark("age-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    materialize(queries["agg_groupby_q1"](spark, sf_dir))
    for t in TABLES:
        materialize(load_table(spark, sf_dir, t))

    report: dict = {"hygiene": os.environ.get("SPARK_GRAFT_STATUS_HYGIENE", "0")}
    report["gc_ms_start"] = gc_ms(spark)
    report["heap_mb_start"] = heap_mb(spark)
    report["fresh"] = time_probes(spark, queries, sf_dir)
    report["gc_ms_after_fresh"] = gc_ms(spark)

    t0 = time.perf_counter()
    n = 0
    for key in sorted(queries):
        try:
            materialize(queries[key](spark, age_sf))
            n += 1
        except Exception as exc:  # noqa: BLE001 — aging load, keep going
            print(f"AGE_FAIL {key}: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
    report["age_pass_keys"] = n
    report["age_pass_sec"] = round(time.perf_counter() - t0, 1)
    report["gc_ms_after_age"] = gc_ms(spark)
    report["heap_mb_after_age"] = heap_mb(spark)

    report["aged"] = time_probes(spark, queries, sf_dir)
    report["gc_ms_end"] = gc_ms(spark)
    report["heap_mb_end"] = heap_mb(spark)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
