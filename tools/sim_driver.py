"""Bare-session simulation of the driver's correctness sweep.

Runs the first N keys of ``all_queries()`` enumeration order (the
driver's window is exactly the first 50) — or the whole registry with
``--all`` — in ONE fresh SparkSession against the DuckDB oracles at the
driver's correctness scale factor, using the same pandas-canonicalizing
compare as the pytest pre-flight (tests/oracle_utils.compare).

Usage:
    python tools/sim_driver.py            # window sim: first 50 keys
    python tools/sim_driver.py --n 41     # first 41 keys
    python tools/sim_driver.py --all      # full registry (every key)
    SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.001 python tools/sim_driver.py

Exit code 0 only if every sampled key passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--keys", type=str, default="", help="comma-separated explicit keys")
    args = ap.parse_args()

    from engine.registry import all_oracles, all_queries
    from engine.session import get_spark
    from tests.conftest import SF_ORACLE, make_duck
    from tests.oracle_utils import compare

    queries = all_queries()
    oracles = all_oracles()
    if args.keys:
        keys = args.keys.split(",")
    else:
        keys = list(queries) if args.all else list(queries)[: args.n]

    spark = get_spark("sim-driver")
    duck = make_duck(SF_ORACLE)
    results: dict[str, str] = {}
    t0 = time.time()
    for i, k in enumerate(keys, 1):
        t1 = time.time()
        try:
            df = queries[k](spark, SF_ORACLE)
            compare(df, duck, oracles[k], key=k)
            results[k] = "PASS"
        except Exception as e:  # noqa: BLE001 — sim must survey, not abort
            results[k] = f"FAIL: {type(e).__name__}: {e}"
        print(
            f"[{i:3d}/{len(keys)}] {results[k][:4]:4s} {k} "
            f"({time.time() - t1:.1f}s)",
            flush=True,
        )
    bad = {k: v for k, v in results.items() if v != "PASS"}
    print(
        json.dumps(
            {
                "sf": SF_ORACLE,
                "keys": len(keys),
                "pass": len(keys) - len(bad),
                "fail": len(bad),
                "failures": bad,
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
