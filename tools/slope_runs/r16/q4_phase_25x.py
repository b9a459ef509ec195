import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, _REPO); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F
from ab_q4_phase import env_df, old_body, timed
from dataflow_pubsub_message_encryption_spark.functions import crypto
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.sources import load_events

SF = "/tmp/sparkgraft-sf2.5"
spark = get_session("q4-phase-25x")

def p0(spark, sf):  # raw scan only
    return load_events(spark, sf).select("event_id", "ts", "user_id", "event_type", "props")

def p0b(spark, sf):  # scan + repartition, no crypto
    d = load_events(spark, sf)
    return d.repartition(spark.sparkContext.defaultParallelism)

def p1(spark, sf):
    return env_df(spark, sf).select("event_id", "ts", "event_type", "ciphertext", "wrapped_dek", "mac")

def p2(spark, sf):
    return crypto.decrypt_verify(env_df(spark, sf), strategy="broadcast").select("event_id", "ts", "event_type", "props_decrypted")

for name, fn in (("p0_scan", p0), ("p0b_scan_repart", p0b), ("p1_envelope", p1), ("p2_decrypt", p2), ("p3_full", old_body)):
    timed(fn, spark, SF)  # warm
    ts = [timed(fn, spark, SF) for _ in range(3)]
    print(f"25x {name}: med {sorted(ts)[1]:.3f} {[round(t,3) for t in ts]}", flush=True)
spark.stop()
