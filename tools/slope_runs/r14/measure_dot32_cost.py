"""One-off: is q32's exponent shift (0.31 -> 0.477) caused by dot32's
per-element casts in the pair fold? Times three bodies on the SAME dirs
(sf0.1 multifile twin + the 25x dir): old (pre-cast double carry), new
(float32 carry + dot32), and hybrid (float32 carry + explicit repartition
+ one post-exchange cast per row).
Usage: python tools/slope_runs/r14/measure_dot32_cost.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402

from dataflow_pubsub_message_encryption_spark.functions.vectors import (  # noqa: E402
    as_double,
    dot,
    norm,
)
from dataflow_pubsub_message_encryption_spark.operators.similarity import (  # noqa: E402
    _DEDUP_TAU,
    _bucket_bits,
    _emb_lsh_pairs_body,
    _grb_auto_bits,
)
from dataflow_pubsub_message_encryption_spark.session import get_session  # noqa: E402
from dataflow_pubsub_message_encryption_spark.sources import load  # noqa: E402

SMALL = "spark-warehouse/sf0.1-multifile"
BIG = "/tmp/sparkgraft-sf25-r14"


def old_body(spark, sf_dir, bits):
    e = load(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        as_double("embedding").alias("emb"),
        norm(as_double("embedding")).alias("nrm"),
        _bucket_bits(as_double("embedding"), bits).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    cs = F.round(
        dot(F.col("x.emb"), F.col("y.emb")) / (F.col("x.nrm") * F.col("y.nrm")), 6
    )
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.bucket").alias("bucket"),
            cs.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _DEDUP_TAU)
    )


def hybrid_body(spark, sf_dir, bits):
    e = load(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        F.col("embedding").alias("emb32"),
        norm(as_double("embedding")).alias("nrm"),
        _bucket_bits(as_double("embedding"), bits).alias("bucket"),
    ).repartition(32, "bucket")
    bd = b.withColumn("emb", as_double("emb32")).drop("emb32")
    x, y = bd.alias("x"), bd.alias("y")
    cs = F.round(
        dot(F.col("x.emb"), F.col("y.emb")) / (F.col("x.nrm") * F.col("y.nrm")), 6
    )
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.bucket").alias("bucket"),
            cs.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _DEDUP_TAU)
    )


BODIES = {"old": old_body, "new": _emb_lsh_pairs_body, "hybrid": hybrid_body}


def main():
    spark = get_session("dot32-cost")
    out = {}
    for sf_dir in (SMALL, BIG):
        n = load(spark, sf_dir, "embeddings").count()
        bits = _grb_auto_bits(n)
        for name, fn in BODIES.items():
            df = fn(spark, sf_dir, bits)
            for _ in range(2):  # warm
                df.write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(2):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            out[f"{name}@{os.path.basename(sf_dir.rstrip('/'))}"] = round(
                min(ts), 3
            )
            print(json.dumps({name: out}, default=str))
    import math

    for name in BODIES:
        a = out[f"{name}@sf0.1-multifile"]
        b = out[f"{name}@sparkgraft-sf25-r14"]
        print(
            json.dumps(
                {
                    "body": name,
                    "sf0.1": a,
                    "sf2.5": b,
                    "exponent": round(math.log(b / a) / math.log(25), 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
