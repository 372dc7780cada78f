"""Capture .explain("formatted") for every registered key (guide §1).

Writes one plan file per key under --out (default /tmp/plans_r13) plus a
summary JSON with plan-shape stats: Exchange count, join strategies,
BatchEvalPython/ArrowEvalPython/MapInPandas nodes, scan PushedFilters
presence, WholeStageCodegen span count. Streaming / foreachBatch keys
execute their stream while BUILDING the returned DataFrame, so their
plan file shows only the final result relation — noted in the summary.

Usage: python tools/plan_audit.py [--only k1,k2] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.registry import all_queries  # noqa: E402
from engine.session import get_spark  # noqa: E402


def explain_str(df, mode: str = "formatted") -> str:
    sess = df.sparkSession
    return sess._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "py_batch": len(re.findall(r"BatchEvalPython", plan)),
        "py_arrow": len(re.findall(r"ArrowEvalPython", plan)),
        "py_map": len(
            re.findall(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed": len(
            [m for m in re.findall(r"PushedFilters: \[(.*?)\]", plan) if m.strip()]
        ),
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=os.environ.get("PLAN_ONLY", ""))
    ap.add_argument("--out", default="/tmp/plans_r13")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if args.only:
        keys = [k for k in args.only.split(",") if k in queries]
    else:
        keys = sorted(queries)

    summary: dict[str, dict] = {}
    for key in keys:
        t0 = time.perf_counter()
        try:
            df = queries[key](spark, args.sf)
            plan = explain_str(df)
            st = plan_stats(plan)
            st["build_s"] = round(time.perf_counter() - t0, 3)
            with open(
                os.path.join(args.out, f"{key}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            summary[key] = st
        except Exception as exc:
            summary[key] = {"err": str(exc)[:200]}
        spark.catalog.clearCache()
    with open(os.path.join(args.out, f"_summary{args.suffix}.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    bad = {k: v for k, v in summary.items() if "err" in v}
    print(json.dumps({"n": len(summary), "errors": len(bad)}))
    if bad:
        for k, v in bad.items():
            print("ERR", k, v["err"], file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
