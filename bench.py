"""Benchmark harness (BASELINE.md protocol).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; each query is materialized with the noop sink
(full execution, no driver collect skew). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from engine.registry import all_queries  # noqa: E402
from engine.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


#: drift canary (VERDICT r11 task 5): five keys whose CODE NEVER
#: CHANGES between rounds, measured fresh (min of 3) every sweep right
#: after warm-up. drift_factor = geometric mean of (now / reference);
#: cross-round comparisons divide by it before calling anything a
#: regression — r11 measured identical code +36% slower from host
#: contention alone, so raw cross-round deltas are meaningless.
#: The five cover distinct subsystems: hash-agg scan, shuffle join,
#: sliding-window HLL (the r10/r11 drift exhibit), array expressions,
#: multi-column null-aware sort. Reference = r12 session of 2026-08-16
#: (BASELINE.md r12); re-pin ONLY when a canary key's code changes.
_CANARY_REF: dict[str, float] = {
    "agg_groupby_q1": 0.555,
    "join_inner_equi": 0.367,
    "win_hll_sliding_distinct": 2.579,
    "text_tokens": 0.232,
    "sort_multi_nulls": 0.589,
}

#: STREAMING drift canary (late r13): the five batch canaries price
#: CPU/shuffle drift but not the trigger/checkpoint I/O floor that
#: dominates replay-fixture streaming keys — the r13 sweep measured
#: unchanged streaming keys swinging >2x in both directions while the
#: batch factor read 1.096 (BASELINE.md r13 variance exhibit). Two
#: code-frozen keys cover the two streaming I/O paths: the state-store
#: checkpoint path (stateful_count) and the foreachBatch ledger path
#: (foreachbatch_upsert). Reported separately as
#: drift_factor_streaming — cross-round STREAMING deltas divide by
#: this, batch deltas keep using drift_factor. Reference = min of 3-4
#: isolated same-protocol samples, r13 session of 2026-08-17 (batch
#: canaries read ~1.1 at pin time, so streaming readings mildly below
#: 1.0 on a quiet host are expected); re-pin ONLY when a canary key's
#: code changes.
_CANARY_STREAM_REF: dict[str, float] = {
    "stream_stateful_count": 2.953,
    "stream_foreachbatch_upsert": 1.608,
}


def run_canary(spark, queries, sf_dir) -> dict:
    import math

    def _measure(refs: dict[str, float]) -> tuple[dict, float | None]:
        times: dict[str, float] = {}
        for key in refs:
            if key not in queries:
                continue
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                materialize(queries[key](spark, sf_dir))
                samples.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            times[key] = round(min(samples), 3)
        ratios = [times[k] / refs[k] for k in times if refs[k] > 0]
        factor = (
            round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3)
            if ratios
            else None
        )
        return times, factor

    times, factor = _measure(_CANARY_REF)
    stimes, sfactor = _measure(_CANARY_STREAM_REF)
    return {
        "keys": times,
        "reference": _CANARY_REF,
        "reference_round": "r12",
        "drift_factor": factor,
        "streaming_keys": stimes,
        "streaming_reference": _CANARY_STREAM_REF,
        "streaming_reference_round": "r13",
        "drift_factor_streaming": sfactor,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = os.environ.get("BENCH_ONLY")
    # bench measures the PRODUCTION configuration: the sketch family
    # (count-min / KMV / Bloom / HLL / AGMS join-size / MinHash-LSH)
    # hashes with JVM-native xxhash64 instead of the portable md5
    # family that exists only so DuckDB oracles can rebuild identical
    # sketches. Correctness sweeps never set this (engine.session.
    # fast_hash defaults off); disclosed below as "hash_mode".
    # SPARK_GRAFT_FAST_HASH=0 restores the portable family here too.
    os.environ.setdefault("SPARK_GRAFT_FAST_HASH", "1")
    hash_mode = (
        "xxhash64-fast (portable md5 under oracle comparison)"
        if os.environ["SPARK_GRAFT_FAST_HASH"] == "1"
        else "portable-md5"
    )
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in set(only.split(","))}

    # warm-up: JVM/codegen/parquet footer caches, plus one full pass
    # over every source table so no measured key pays the first
    # cold read of its table (page cache + footer + dictionary decode)
    warm = queries.get("agg_groupby_q1") or next(iter(queries.values()))
    materialize(warm(spark, sf_dir))
    from engine.session import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # drift canary first — before the sweep's own memory pressure
    canary = None if only else run_canary(spark, queries, sf_dir)

    # BASELINE.md protocol: per-query MIN over adaptive repeats. This
    # host shows multi-second stalls from external contention that hit
    # a RANDOM key each sweep (same key: 0.8 s and 13 s in back-to-back
    # identical runs), and a stall can span both samples of a fixed
    # min-of-2. So: take BENCH_RUNS samples (default 2), then keep
    # sampling (cap 5) until the two fastest agree within 1.6× — the
    # stable minimum measures the plan, not the neighbors. BENCH_RUNS=1
    # restores the old fast single-shot sweep.
    runs = max(1, int(os.environ.get("BENCH_RUNS", "2")))
    cap = max(runs, int(os.environ.get("BENCH_RUNS_MAX", "5")))
    per_query: dict[str, float] = {}
    for key in sorted(queries):
        times: list[float] = []
        try:
            while True:
                t0 = time.perf_counter()
                materialize(queries[key](spark, sf_dir))
                times.append(time.perf_counter() - t0)
                # isolate timings: drop caches a query left behind so
                # later keys aren't measured under its memory pressure
                spark.catalog.clearCache()
                if len(times) < runs:
                    continue
                if len(times) >= cap or runs == 1:
                    break
                lo = sorted(times)[:2]
                if lo[1] <= lo[0] * 1.6 or lo[0] < 0.05:
                    break
            per_query[key] = round(min(times), 3)
        except Exception as exc:  # keep the sweep alive; surface the failure
            per_query[key] = -1.0
            print(f"BENCH_FAIL {key}: {exc}", file=sys.stderr)
            spark.catalog.clearCache()

    total = round(sum(v for v in per_query.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                # honest name (ADVICE r3): the value is a SUM of per-query
                # minimums over adaptive repeats, not one sweep's wall clock
                "metric": "sum_of_per_query_min_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "n_queries": len(per_query),
                "protocol": (
                    f"per-query min over >= {runs} adaptive repeats "
                    "(BASELINE.md); value = sum of those minimums"
                ),
                "hash_mode": hash_mode,
                "drift_canary": canary,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
