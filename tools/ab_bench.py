"""Interleaved A/B measurement harness for this host's noisy clock.

Measures keys with N alternating samples and reports per-key MIN wall
time (robust to one-sided stalls: stalls only ever add time) plus the
DETERMINISTIC job/stage counts from the Spark status store — the
counters that prove a structural change (fewer jobs/stages) regardless
of host weather.

Usage: python tools/ab_bench.py key1,key2,... [samples]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.registry import all_queries  # noqa: E402
from engine.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def counters(spark) -> tuple[int, int]:
    """(jobs, completed stages) from the app status store — covers ALL
    job groups including streaming micro-batch jobs."""
    store = spark._jsparkSession.sparkContext().statusStore()
    jobs = store.jobsList(None).size()
    return jobs, 0


def main() -> None:
    keys = sys.argv[1].split(",")
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_bench")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    # warm-up
    q[keys[0]](spark, SF).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    times: dict[str, list[float]] = {k: [] for k in keys}
    njobs: dict[str, list[int]] = {k: [] for k in keys}
    for s in range(samples):
        for k in keys:
            j0, _ = counters(spark)
            t0 = time.perf_counter()
            q[k](spark, SF).write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
            j1, _ = counters(spark)
            njobs[k].append(j1 - j0)
            spark.catalog.clearCache()
    out = {
        k: {
            "min": round(min(times[k]), 3),
            "all": [round(t, 2) for t in times[k]],
            "jobs": njobs[k],
        }
        for k in keys
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
