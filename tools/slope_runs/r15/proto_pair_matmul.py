"""Prototype: Arrow/numpy within-cell pair pass for SemDeDup (NOT shipped).

The session's sizing refutation measured the codegen'd per-pair cosine
fold at ~1.75 us/pair vs ~0.5 ns per BLAS assignment dot (~3500x). This
prototypes the `_km_assign_arrow` treatment for the PAIR pass: group the
(vec_id, cell, de) base by cell, compute each cell's pairwise cosine
block as one numpy matmul inside applyInPandas, emit the RAW double and
round Spark-side (F.round half-up, same as the fold/oracle).

Measures (1) round-6 value agreement vs the engine fold on the graded
fixture's full pair set, (2) kernel timing at a scaled dir.

Usage: python tools/slope_runs/r15/proto_pair_matmul.py [scaled_dir]
"""
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.operators import similarity as S

spark = get_session("proto-pair-matmul")


def np_pairs(base):
    def pair_cells(pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_raw": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos_raw": "float64"}
            )
        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        V = np.array(pdf["de"].tolist(), dtype=np.float64)[order]
        nrm = np.sqrt((V * V).sum(axis=1))
        sims = (V @ V.T) / np.outer(nrm, nrm)
        iu = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"id_a": ids[iu[0]], "id_b": ids[iu[1]], "cos_raw": sims[iu]}
        )

    raw = base.groupBy("cell").applyInPandas(
        pair_cells, "id_a long, id_b long, cos_raw double"
    )
    # rounding stays Spark-side (half-up, the fold/oracle discipline);
    # only the raw double sum order differs (numpy pairwise vs fold
    # sequential) — the agreement check below measures that risk.
    return raw.select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))


def base_for(sf_dir):
    e = S.load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    n = e.count()
    k = S._sd_auto_k(n)
    stride = S._km_auto_stride(n, k)
    e_q = e.select(
        "vec_id",
        S.as_double("embedding").alias("de"),
        F.transform(
            S.as_double("embedding"),
            lambda x: F.round(x * S._CENT_SCALE).cast("long"),
        ).alias("qe"),
    ).localCheckpoint(eager=True)
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
    assign = S._km_assign_arrow(e_q, cents)
    return (
        assign.alias("a")
        .join(e_q.alias("v"), F.col("a.vec_id") == F.col("v.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"), "cell", F.col("v.de").alias("de")
        )
        .localCheckpoint(eager=True)
    )


def fold_pairs(base):
    return (
        base.alias("pa")
        .join(
            base.alias("pb"),
            (F.col("pa.cell") == F.col("pb.cell"))
            & (F.col("pa.vec_id") < F.col("pb.vec_id")),
        )
        .select(
            F.col("pa.vec_id").alias("id_a"),
            F.col("pb.vec_id").alias("id_b"),
            F.round(S.cosine(F.col("pa.de"), F.col("pb.de")), 6).alias("cos_sim"),
        )
    )


# --- 1) exact agreement on the graded fixture's full pair set ---
for fx in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
    b = base_for(fx)
    fold = {(r.id_a, r.id_b): r.cos_sim for r in fold_pairs(b).collect()}
    arrw = {(r.id_a, r.id_b): r.cos_sim for r in np_pairs(b).collect()}
    same = sum(1 for kk, v in fold.items() if arrw.get(kk) == v)
    print(f"AGREEMENT {fx}: {same}/{len(fold)} identical round-6 values "
          f"(numpy set size {len(arrw)})")

# --- 2) kernel timing at the scaled dir ---
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft-sf2.5-emb"
b = base_for(sf_dir)
for name, mk in [("fold", fold_pairs), ("numpy", np_pairs)]:
    for p in range(3):
        t0 = time.time()
        n = mk(b).count()
        print(f"TIMING {sf_dir} {name} pass{p}: {n} pairs in "
              f"{time.time()-t0:.2f} s")
