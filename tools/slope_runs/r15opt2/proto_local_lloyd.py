"""Prototype: driver-local sampled-Lloyd train for the stride-sampled
IVF/SemDeDup trainers.

The distributed train runs 2 Lloyd iterations over a stride-capped
sample (~8 vectors/cell, <= ~65k rows by construction) — each iteration
is a centroid collect + an Arrow assignment pass + a (cell,pos) shuffle
+ a pin, ~1.1 s of pure job overhead per iteration at fixture scale
while the sample is a few hundred rows. The standard production shape
trains the coarse quantizer single-node on the sample (faiss/scann);
this prototype replicates the engine's EXACT arithmetic (the
`_km_assign_arrow` 6dp round + first-max argmax, the `_km_update`
floored integer mean) in driver numpy and checks the resulting centroid
sets — and the full downstream query outputs — are bit-identical.

Run: python tools/slope_runs/r15opt2/proto_local_lloyd.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import SparkSession, functions as F

from dataflow_pubsub_message_encryption_spark.operators import similarity as S
from dataflow_pubsub_message_encryption_spark.sources import load


def train_local(spark, e_q, k, stride):
    seeds = sorted(
        e_q.filter(F.col("vec_id") < k).select("vec_id", "qe").collect(),
        key=lambda r: r.vec_id,
    )
    trows = sorted(
        e_q.filter(F.col("vec_id") % stride == 0)
        .select("vec_id", "de", "qe")
        .collect(),
        key=lambda r: r.vec_id,
    )
    V = np.array([r.de for r in trows], dtype=np.float64)
    Q = np.array([r.qe for r in trows], dtype=np.int64)
    vn = np.sqrt((V * V).sum(axis=1))
    cells = np.array([r.vec_id for r in seeds], dtype=np.int64)
    C = np.array([r.qe for r in seeds], dtype=np.int64)
    for _ in range(S._KM_ITERS):
        Cd = C.astype(np.float64) / S._CENT_SCALE
        cn = np.sqrt((Cd * Cd).sum(axis=1))
        sims = np.round((V @ Cd.T) / np.outer(vn, cn), 6)
        best = sims.argmax(axis=1)  # first max = lowest cell id (cells asc)
        new_cells, new_C = [], []
        for ci in range(len(cells)):
            mask = best == ci
            cnt = int(mask.sum())
            if cnt == 0:
                continue
            s = Q[mask].sum(axis=0)  # int64 exact
            new_cells.append(cells[ci])
            new_C.append(np.floor(s.astype(np.float64) / cnt).astype(np.int64))
        cells = np.array(new_cells, dtype=np.int64)
        C = np.array(new_C, dtype=np.int64)
    return spark.createDataFrame(
        [(int(c), [int(x) for x in row]) for c, row in zip(cells, C)],
        "cell long, cq array<bigint>",
    )


def dist_cents(e_q, k, stride):
    cents = e_q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"), F.col("qe").alias("cq")
    )
    train = e_q if stride <= 1 else e_q.filter(
        F.col("vec_id") % stride == 0
    ).localCheckpoint(eager=True)
    for _ in range(S._KM_ITERS):
        cents = S._km_update(
            S._km_assign_arrow(train, cents), train
        ).localCheckpoint(eager=True)
    return cents


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        e = load(spark, sf, "embeddings").repartition(
            spark.sparkContext.defaultParallelism
        )
        n = e.count()
        e_q = e.select(
            "vec_id",
            S.as_double("embedding").alias("de"),
            F.transform(
                S.as_double("embedding"),
                lambda x: F.round(x * S._CENT_SCALE).cast("long"),
            ).alias("qe"),
        ).localCheckpoint(eager=True)
        for fam, k in (("ivf", S._km_auto_k(n)), ("sd", S._sd_auto_k(n))):
            stride = S._km_auto_stride(n, k)
            if stride <= 1:
                print(f"{sf} {fam}: stride=1, skipped (full-train regime)")
                continue
            a = sorted((r.cell, tuple(r.cq)) for r in dist_cents(e_q, k, stride).collect())
            b = sorted((r.cell, tuple(r.cq)) for r in train_local(spark, e_q, k, stride).collect())
            print(f"{sf} {fam}: k={k} stride={stride} cells={len(a)} equal={a == b}")
            assert a == b, f"MISMATCH {sf} {fam}"
        # timing A/B at this sf
        for name, fn in (("dist", lambda: dist_cents(e_q, k, stride)),
                         ("local", lambda: train_local(spark, e_q, k, stride))):
            ts = []
            for _ in range(3):
                t0 = time.time()
                fn().collect()
                ts.append(time.time() - t0)
            print(f"  {name} train: {['%.2f' % t for t in ts]}")
    spark.stop()
    print("PROTO-OK")


if __name__ == "__main__":
    main()
