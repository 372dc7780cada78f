"""Recall-recovery A/B for pipeline_ann_retrain_apply (r13 — VERDICT
r12 task 1's measurement half): on a DELIBERATELY-DRIFTED corpus, does
re-fitting the drift-flagged cells' centroids recover IVF probe recall?

Scenario (the production story the retrain loop exists for):
  1. the coarse quantizer is fit on the PRE-DRIFT corpus (the first
     75% of vectors by vec_id) — the "frozen at index build" state;
  2. drift arrives: the last 25% of vectors are shifted by a constant
     offset (+{OFFSET} on the first {DIMS} dims — deterministic, no
     RNG), forming a cluster the stale quantizer has no centroid near;
  3. the ingest funnel's recent-vs-baseline comparison runs at the
     REAL +5% alert threshold (_RG_NUM/_RG_DEN — this also validates
     that the production gate fires under true drift, where the
     stationary fixtures showed it staying quiet);
  4. flagged cells re-fit exactly as pipeline_ann_retrain_apply does
     (exact 1e-9-unit integer means over each flagged cell's
     currently-assigned vectors — engine helpers, same code path);
  5. recall@5 of the IVF probe (nprobe cells by centroid distance,
     exact cosine within the probed cells' members) is measured for
     drifted-region queries against the exact full-corpus top-5, in
     THREE arms:
       (a) stale      — stale centroids, stale membership (no act);
       (b) retrained  — retrained centroids, membership still as
                        assigned under the stale quantizer (the
                        apply's immediate world: re-fit moves what the
                        probe ranks, re-assignment waits for the next
                        ingest/compaction cycle) — a TRANSITION state
                        that can go either way on isotropic data;
       (c) reassigned — retrained centroids AND membership re-assigned
                        under them (the steady state the maintenance
                        loop converges to).

The funnel/decision/refit arithmetic runs through the engine's Spark
helpers (_argmin_cell_sql, _drift_decisions, the integer-mean refit);
the recall bookkeeping is driver-side numpy over the collected toy
corpus (measurement tooling, not an operator — the operators under
test are the decision + refit steps).

Usage: python tools/retrain_drift_ab.py [--sf /root/testdata/sf0.01]
Prints one JSON line with gate/flag counts and both recall numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 0.3
DIMS = 8
NPROBE = 3
TOPK = 5
NQUERIES = 20


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    import engine.streaming as S
    from engine.kmeans import kmeans_fit
    from engine.session import T, get_spark

    spark = get_spark()
    emb = T(spark, args.sf, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    n = emb.count()
    cut = (n * 3) // 4
    shift = F.expr(
        f"transform(embedding, (x, i) -> x + if(i < {DIMS}, "
        f"cast({OFFSET} as double), 0d))"
    )
    drifted = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") >= cut, shift).otherwise(F.col("embedding")),
    ).localCheckpoint()

    # 1-2. stale quantizer: fit on the pre-drift prefix only
    stale_means, _it = kmeans_fit(emb.filter(F.col("vec_id") < cut))
    argmin = S._argmin_cell_sql(stale_means)
    asg = (
        drifted.select(
            "vec_id",
            "embedding",
            F.expr(argmin)["cell"].alias("cell"),
            F.expr(argmin)["du"].alias("du"),
        )
        .withColumn(
            "batch_id",
            F.when(F.col("vec_id") >= cut, F.lit(1)).otherwise(F.lit(0)),
        )
        .localCheckpoint()
    )

    # 3. the REAL +5% alert gate over the two-batch funnel
    funnel = asg.groupBy("batch_id", "cell").agg(
        F.count(F.lit(1)).alias("n"), F.sum("du").alias("sdu")
    )
    decs = S._drift_decisions(funnel, S._RG_NUM, S._RG_DEN)
    flagged = sorted(
        r["cell"] for r in decs.filter(F.col("retrain")).collect()
    )

    # 4. integer-mean refit of flagged cells (the apply's arithmetic)
    sums = (
        asg.filter(S._sql_in("cell", flagged))
        .select("cell", F.posexplode("embedding").alias("i", "v"))
        .groupBy("cell", "i")
        .agg(
            F.sum(F.expr("cast(round(v * 1e9) as bigint)")).alias("sm"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    newm = {
        r["cell"]: [
            s["m"]
            for s in sorted(
                (row for row in r["ms"]), key=lambda s: s["i"]
            )
        ]
        for r in sums.groupBy("cell")
        .agg(
            F.collect_list(
                F.struct(
                    "i", (F.col("sm") / (F.lit(1e9) * F.col("cnt"))).alias("m")
                )
            ).alias("ms")
        )
        .collect()
    }
    retrained_means = [
        newm.get(c, list(m)) for c, m in enumerate(stale_means)
    ]

    # 5. recall bookkeeping (numpy, driver-side — toy corpus)
    rows = sorted(
        (r["vec_id"], r["cell"], r["embedding"]) for r in asg.collect()
    )
    ids = np.array([r[0] for r in rows])
    cells = np.array([r[1] for r in rows])
    E = np.array([r[2] for r in rows])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    qidx = np.argsort(ids)[-NQUERIES:]  # drifted-region queries

    def recall(means: list[list[float]], member: np.ndarray) -> float:
        M = np.array(means)
        hit = 0
        for qi in qidx:
            cos = En @ En[qi]
            cos[qi] = -2
            exact = set(np.argsort(-cos)[:TOPK])
            cd = ((M - E[qi]) ** 2).sum(axis=1)
            probed = set(np.argsort(cd)[:NPROBE])
            cand = np.where(np.isin(member, list(probed)))[0]
            cand = cand[cand != qi]
            got = set(cand[np.argsort(-cos[cand])[:TOPK]])
            hit += len(exact & got)
        return round(hit / (NQUERIES * TOPK), 3)

    RM = np.array(retrained_means)
    reassigned = np.array(
        [np.argmin(((RM - e) ** 2).sum(axis=1)) for e in E]
    )
    out = {
        "sf": args.sf,
        "n": int(n),
        "drifted": int(n - cut),
        "offset": OFFSET,
        "dims": DIMS,
        "gate": f"+{S._RG_NUM - S._RG_DEN}%",
        "flagged_cells": flagged,
        "nprobe": NPROBE,
        "recall_stale": recall(stale_means, cells),
        "recall_retrained": recall(retrained_means, cells),
        "recall_reassigned": recall(retrained_means, reassigned),
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
