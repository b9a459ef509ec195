"""Prototype measurement for the named r15 candidate: TWO-LEVEL coarse
assignment for the learned-IVF build. The r14 100x census measured q30's
final assignment (argmax over k = sqrt(n) broadcast centroids per vector)
at ~91% of the query; this scratch measures what the standard IVF-tree
move buys BEFORE r15 builds the registered key + oracle.

Two-level shape: group the k centroids into g = ceil(sqrt(k)) super-cells
(each centroid assigned to its nearest super-centroid; super-centroids =
the g lowest-cell-id centroids, the same metadata-free seeding idiom the
flat build uses). A vector then does argmax over g supers, then argmax
over only that super's centroids: ~g + k/g dots per vector instead of k.
Assignment becomes APPROXIMATE (the true nearest centroid can live in a
neighboring super) - the agreement census below prices that trade.

Usage: python tools/slope_runs/r14/proto_twolevel_assign.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402

from dataflow_pubsub_message_encryption_spark.operators import similarity as S  # noqa: E402
from dataflow_pubsub_message_encryption_spark.session import get_session  # noqa: E402
from dataflow_pubsub_message_encryption_spark.sources import load  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft-sf10-emb"


def main():
    spark = get_session("proto-twolevel")
    e = load(spark, SF_DIR, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    n = e.count()
    k = S._km_auto_k(n)
    stride = S._km_auto_stride(n, k)
    print(f"n={n} k={k} stride={stride}", flush=True)

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
    train = e_q.filter(F.col("vec_id") % stride == 0).localCheckpoint(eager=True)
    t0 = time.time()
    for _ in range(S._KM_ITERS):
        cents = S._km_update(S._km_assign(train, cents), train).localCheckpoint(
            eager=True
        )
    print(f"train: {time.time() - t0:.1f}s", flush=True)

    # ---- flat assignment (the shipped shape): argmax over k per vector
    def run(df, label):
        for i in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            print(f"{label} pass{i}: {time.time() - t0:.1f}s", flush=True)

    flat = S._km_assign(e_q, cents).localCheckpoint(eager=True)
    run(S._km_assign(e_q, cents), "flat_assign")

    # ---- two-level: supers = the g lowest-cell-id centroids; every
    # centroid assigned to its nearest super (a k x g broadcast argmax -
    # KB-scale); vectors argmax over supers then within the super
    import math

    g = math.isqrt(k - 1) + 1
    supers = cents.orderBy("cell").limit(g).select(
        F.col("cell").alias("sup"), F.col("cq").alias("sq")
    )
    sd = F.transform("sq", lambda x: x.cast("double") / S._CENT_SCALE)
    cd = F.transform("cq", lambda x: x.cast("double") / S._CENT_SCALE)
    cent_sup = (
        cents.join(F.broadcast(supers))
        .groupBy("cell")
        .agg(
            F.max_by(
                "sup", F.struct(F.round(S.cosine(cd, sd), 6), (-F.col("sup")))
            ).alias("sup"),
            F.first("cq").alias("cq"),
        )
        .localCheckpoint(eager=True)
    )

    vd = F.transform("qe", lambda x: x.cast("double") / S._CENT_SCALE)

    def twolevel(frame):
        vsup = (
            frame.join(F.broadcast(supers))
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "sup", F.struct(F.round(S.cosine(vd, sd), 6), (-F.col("sup")))
                ).alias("sup"),
                F.first("qe").alias("qe"),
            )
        )
        return (
            vsup.join(F.broadcast(cent_sup), "sup")
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "cell", F.struct(F.round(S.cosine(vd, cd), 6), (-F.col("cell")))
                ).alias("cell")
            )
        )

    run(twolevel(e_q), "twolevel_assign")

    # ---- agreement census: how often does the cheap assignment agree?
    two = twolevel(e_q).localCheckpoint(eager=True)
    agree = (
        flat.select("vec_id", F.col("cell").alias("c1"))
        .join(two.select("vec_id", F.col("cell").alias("c2")), "vec_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("c1") == F.col("c2"), 1).otherwise(0)).alias(
                "same"
            ),
        )
        .collect()[0]
    )
    print(
        f"agreement: {agree.same}/{agree.n} = {agree.same / agree.n:.4f} "
        f"(g={g}, dots/vec {g}+~{k // g} vs {k})",
        flush=True,
    )
    spark.stop()


def multiprobe_curve():
    """Second pass: agreement + cost vs number of probed supers (the
    multi-probe knob real IVF-trees use when the coarse level is weak)."""
    spark = get_session("proto-twolevel-mp")
    e = load(spark, SF_DIR, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    n = e.count()
    k = S._km_auto_k(n)
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
    train = e_q.filter(F.col("vec_id") % stride == 0).localCheckpoint(eager=True)
    for _ in range(S._KM_ITERS):
        cents = S._km_update(S._km_assign(train, cents), train).localCheckpoint(
            eager=True
        )
    flat = S._km_assign(e_q, cents).localCheckpoint(eager=True)

    import math

    g = math.isqrt(k - 1) + 1
    supers = cents.orderBy("cell").limit(g).select(
        F.col("cell").alias("sup"), F.col("cq").alias("sq")
    )
    sd = F.transform("sq", lambda x: x.cast("double") / S._CENT_SCALE)
    cd = F.transform("cq", lambda x: x.cast("double") / S._CENT_SCALE)
    cent_sup = (
        cents.join(F.broadcast(supers))
        .groupBy("cell")
        .agg(
            F.max_by(
                "sup", F.struct(F.round(S.cosine(cd, sd), 6), (-F.col("sup")))
            ).alias("sup"),
            F.first("cq").alias("cq"),
        )
        .localCheckpoint(eager=True)
    )
    vd = F.transform("qe", lambda x: x.cast("double") / S._CENT_SCALE)
    from pyspark.sql import Window

    for p in (2, 4, 8):
        # top-p supers per vector, then argmax over those supers' centroids
        scored = e_q.join(F.broadcast(supers)).select(
            "vec_id",
            "qe",
            "sup",
            F.round(S.cosine(vd, sd), 6).alias("ss"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("ss"), "sup")
        topp = scored.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= p
        )
        two = (
            topp.join(F.broadcast(cent_sup), "sup")
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "cell",
                    F.struct(F.round(S.cosine(vd, cd), 6), (-F.col("cell"))),
                ).alias("cell")
            )
        )
        t0 = time.time()
        two.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        agree = (
            flat.select("vec_id", F.col("cell").alias("c1"))
            .join(two.select("vec_id", F.col("cell").alias("c2")), "vec_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("c1") == F.col("c2"), 1).otherwise(0)).alias(
                    "same"
                ),
            )
            .collect()[0]
        )
        print(
            f"p={p}: {dt:.1f}s agreement {agree.same}/{agree.n} = "
            f"{agree.same / agree.n:.4f} (dots/vec ~{g}+{p * (k // g)})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "multiprobe":
        multiprobe_curve()
    else:
        main()
