import os, sys, time
sys.path.insert(0, os.getcwd())
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from dataflow_pubsub_message_encryption_spark.operators import similarity as S
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.sources import load

SF_DIR = "/tmp/sparkgraft-sf10-emb"
spark = get_session("proto-matmul")
e = load(spark, SF_DIR, "embeddings").repartition(spark.sparkContext.defaultParallelism)
n = e.count(); k = S._km_auto_k(n); stride = S._km_auto_stride(n, k)
e_q = e.select(
    "vec_id",
    S.as_double("embedding").alias("de"),
    F.transform(S.as_double("embedding"), lambda x: F.round(x * S._CENT_SCALE).cast("long")).alias("qe"),
).localCheckpoint(eager=True)
cents = e_q.filter(F.col("vec_id") < k).select(F.col("vec_id").alias("cell"), F.col("qe").alias("cq"))
train = e_q.filter(F.col("vec_id") % stride == 0).localCheckpoint(eager=True)
for _ in range(S._KM_ITERS):
    cents = S._km_update(S._km_assign(train, cents), train).localCheckpoint(eager=True)
flat = S._km_assign(e_q, cents).localCheckpoint(eager=True)

# centroid matrix to the driver (k x 64 = KB-scale), L2-normalized rows
crows = cents.orderBy("cell").collect()
cell_ids = np.array([r.cell for r in crows], dtype=np.int64)
C = np.array([r.cq for r in crows], dtype=np.float64) / S._CENT_SCALE
Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
bC = spark.sparkContext.broadcast((cell_ids, Cn))

def assign_batches(it):
    ids, Cn = bC.value
    for pdf in it:
        V = np.array(pdf["qe"].tolist(), dtype=np.float64) / S._CENT_SCALE
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = np.round(Vn @ Cn.T, 6)           # the engine's 6dp discipline
        # engine tie-break: highest sim, then LOWEST cell id — cells are
        # sorted ascending, argmax returns the first (lowest-id) maximum
        best = sims.argmax(axis=1)
        yield pd.DataFrame({"vec_id": pdf["vec_id"], "cell": ids[best]})

mm = e_q.select("vec_id", "qe").mapInPandas(assign_batches, "vec_id long, cell long")
for i in range(3):
    t0 = time.time(); mm.write.format("noop").mode("overwrite").save()
    print(f"matmul_assign pass{i}: {time.time()-t0:.1f}s", flush=True)
two = mm.localCheckpoint(eager=True)
a = (flat.select("vec_id", F.col("cell").alias("c1"))
     .join(two.select("vec_id", F.col("cell").alias("c2")), "vec_id")
     .agg(F.count("*").alias("n"), F.sum(F.when(F.col("c1")==F.col("c2"),1).otherwise(0)).alias("same")).collect()[0])
print(f"agreement: {a.same}/{a.n} = {a.same/a.n:.6f}", flush=True)
spark.stop()
