"""Re-measure q30's 100x phase split AFTER the Arrow-matmul swap.

r14 measured the interpreted broadcast-centroid argmax fold at 86-96 s
of ~95 s total at 200k vectors (91% of the query). This re-runs the
same split with the shipped `_km_assign_arrow` stage: (1) build = scan
+ checkpoint + sample-capped Lloyd train, (2) the full-corpus final
assignment alone, (3) the full registered query. Usage:
    python tools/slope_runs/r15/profile_q30_phases.py /tmp/sparkgraft-sf10-emb
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())
from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.materialize import release_pins
from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators import similarity as S
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.sources import load

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft-sf10-emb"
spark = get_session("profile-q30")
queries, _ = registry()

for attempt in range(3):
    t0 = time.time()
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
    train = e_q.filter(F.col("vec_id") % stride == 0).localCheckpoint(
        eager=True
    )
    for _ in range(S._KM_ITERS):
        cents = S._km_update(
            S._km_assign_arrow(train, cents), train
        ).localCheckpoint(eager=True)
    t_build = time.time() - t0

    t0 = time.time()
    S._km_assign_arrow(e_q, cents).write.format("noop").mode(
        "overwrite"
    ).save()
    t_assign = time.time() - t0

    release_pins(spark)
    t0 = time.time()
    queries["sim_ann_kmeans_ivf_topk_auto_sampled"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    t_full = time.time() - t0
    release_pins(spark)
    print(
        f"pass{attempt}: n={n} k={k} stride={stride} "
        f"build={t_build:.1f}s assign={t_assign:.1f}s full={t_full:.1f}s "
        f"assign_share_of_full={t_assign / max(t_full, 1e-9):.2f}",
        flush=True,
    )
spark.stop()
