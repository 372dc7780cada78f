"""Per-job timeline for one key: job id, duration, #tasks, description.

Shows where a multi-action key's wall time goes (guide §1/§7 — the
UI's Jobs page, rendered textually from the status store). Also prints
inter-job driver gaps, which is where py4j/planning latency hides.

Usage: python tools/job_timeline.py <key> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.registry import all_queries  # noqa: E402
from engine.session import get_spark  # noqa: E402


def main() -> None:
    key = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("job_timeline")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[key]
    # warm-up run (footer caches, codegen) so the timeline shows the
    # steady-state plan, then the measured run
    q(spark, sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    store = spark._jsparkSession.sparkContext().statusStore()
    j0 = store.jobsList(None).size()
    t0 = time.perf_counter()
    q(spark, sf).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size() - j0):
        j = jobs.apply(i)  # newest first
        sub = j.submissionTime().get()
        comp = j.completionTime().get()
        rows.append(
            (
                j.jobId(),
                sub.getTime(),
                comp.getTime(),
                j.numTasks(),
                (j.description().get() if j.description().isDefined() else j.name())[
                    :90
                ],
            )
        )
    rows.sort()
    prev_end = None
    tot_job = 0.0
    tot_gap = 0.0
    for jid, sub, comp, ntasks, name in rows:
        dur = (comp - sub) / 1000.0
        gap = (sub - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = comp
        tot_job += dur
        tot_gap += max(0.0, gap)
        print(f"job {jid:4d}  dur {dur:7.3f}s  gap {gap:7.3f}s  tasks {ntasks:4d}  {name}")
    print(
        f"\nwall {wall:.3f}s  in-job {tot_job:.3f}s  inter-job gaps {tot_gap:.3f}s  n_jobs {len(rows)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
