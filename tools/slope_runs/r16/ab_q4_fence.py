"""q4: single-decrypt fence variant — a nondeterministic project field
blocks the MAC-verify filter from being alias-substituted below the
projection (and from folding into the join condition), so aes_decrypt
evaluates ONCE per row instead of twice for survivors."""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, _REPO); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F
from ab_q4_phase import env_df, old_body, timed, canon
from dataflow_pubsub_message_encryption_spark.functions import crypto
from dataflow_pubsub_message_encryption_spark.functions.normalize import ts_str
from dataflow_pubsub_message_encryption_spark.operators.ref_pipeline import _WRAPPED
from dataflow_pubsub_message_encryption_spark.session import get_session

def decrypt_verify_fenced(df, known_keys):
    spark = df.sparkSession
    keys = spark.createDataFrame([(w,) for w in known_keys], "_w string").withColumn(
        "_dek", crypto.unwrap_dek_udf(F.col("_w")))
    joined = df.join(F.broadcast(keys), F.col("wrapped_dek") == F.col("_w"))
    plain = F.aes_decrypt(F.col("ciphertext"), F.col("_dek")).cast("string")
    fenced = joined.select("*", plain.alias("props_decrypted"), F.rand().alias("_fence"))
    keep = (F.col("_fence") >= 0) & (crypto.mac_col(F.col("props_decrypted")) == F.col("mac"))
    return fenced.filter(keep).drop("_w", "_dek", "_fence")

def fence_body(spark, sf_dir):
    env = env_df(spark, sf_dir)
    plain = decrypt_verify_fenced(env, _WRAPPED)
    parsed = plain.withColumn("k", F.from_json("props_decrypted", "k INT").getField("k"))
    return (
        parsed.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("k").cast("long").alias("sum_k"))
        .select(ts_str(F.col("window.start")).alias("window_start"), "event_type", "n_events", "sum_k")
    )

spark = get_session("ab-q4-fence")
# plan check: count aesDecrypt occurrences
df = fence_body(spark, "/root/testdata/sf0.1")
plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
print("aesDecrypt count in fenced plan:", plan.count("aesDecrypt"))
print("aesEncrypt count:", plan.count("aesEncrypt"))
open("tools/slope_runs/r16/q4_fence_plan.txt","w").write(plan)
for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    a = canon(old_body(spark, sf)); b = canon(fence_body(spark, sf))
    assert a == b, f"fence mismatch at {sf}"
    print(f"equal at {sf}: {len(a)} rows", flush=True)
for SF, reps in (("/root/testdata/sf0.1", 5), ("/tmp/sparkgraft-sf2.5", 3)):
    for _ in range(2):
        timed(old_body, spark, SF); timed(fence_body, spark, SF)
    old, new = [], []
    for _ in range(reps):
        old.append(timed(old_body, spark, SF))
        new.append(timed(fence_body, spark, SF))
    print(f"{SF}: old med {sorted(old)[len(old)//2]:.3f} {[round(t,3) for t in old]} | fence med {sorted(new)[len(new)//2]:.3f} {[round(t,3) for t in new]}", flush=True)
spark.stop()
