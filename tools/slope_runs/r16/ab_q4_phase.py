"""q4 pipeline_end_to_end: phase profile + candidate-fix A/B (round 16).

Phases (each timed through the noop sink, release_pins between):
  p1_envelope   scan -> repartition -> aes_encrypt + mac (+tamper)
  p2_decrypt    + broadcast unwrap join + aes_decrypt + MAC verify filter
  p3_full       + from_json + hourly window agg (the registered query)
  p_keys        the unwrap keys branch alone (distinct over the corpus)

Variants A/B'd (interleaved, N reps each, same session):
  old           the registered body as-is
  known_keys    keys branch replaced by a 4-row local relation of the
                wrapped-key literals (with_envelope's own constants) ->
                unwrap UDF -> broadcast (removes the corpus distinct pass)
  known+nocp    known_keys + constraintPropagation off for the query
                (kills the isnotnull(sha2(...)) pushed to the scan filter)

Equality: full collect-compare of old vs each variant at sf0.001/sf0.01/
sf0.1 before any timing is trusted.
"""

import os
import sys
import time

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.functions import crypto
from dataflow_pubsub_message_encryption_spark.functions.normalize import ts_str
from dataflow_pubsub_message_encryption_spark.materialize import release_pins
from dataflow_pubsub_message_encryption_spark.operators.ref_pipeline import (
    _N_KEYS,
    _WRAPPED,
)
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.sources import load_events, with_envelope

SF = "/root/testdata/sf0.1"
REPS = int(os.environ.get("REPS", "5"))


def env_df(spark, sf_dir):
    return with_envelope(load_events(spark, sf_dir), n_keys=_N_KEYS, tamper=True)


def old_body(spark, sf_dir):
    env = env_df(spark, sf_dir)
    plain = crypto.decrypt_verify(env, strategy="broadcast")
    parsed = plain.withColumn("k", F.from_json("props_decrypted", "k INT").getField("k"))
    return (
        parsed.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("k").cast("long").alias("sum_k"))
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_k",
        )
    )


def decrypt_verify_known(df, known_keys):
    """decrypt_verify(strategy='broadcast') with the key population given
    as literals instead of discovered by a corpus distinct."""
    spark = df.sparkSession
    keys = spark.createDataFrame(
        [(w,) for w in known_keys], "_w string"
    ).withColumn("_dek", crypto.unwrap_dek_udf(F.col("_w")))
    joined = df.join(F.broadcast(keys), F.col("wrapped_dek") == F.col("_w"))
    plain = F.aes_decrypt(F.col("ciphertext"), F.col("_dek")).cast("string")
    tag = crypto.mac_col
    return (
        joined.withColumn("props_decrypted", plain)
        .filter(tag(F.col("props_decrypted")) == F.col("mac"))
        .drop("_w", "_dek")
    )


def known_body(spark, sf_dir):
    env = env_df(spark, sf_dir)
    plain = decrypt_verify_known(env, _WRAPPED)
    parsed = plain.withColumn("k", F.from_json("props_decrypted", "k INT").getField("k"))
    return (
        parsed.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("k").cast("long").alias("sum_k"))
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_k",
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, spark, sf_dir):
    t0 = time.time()
    noop(fn(spark, sf_dir))
    dt = time.time() - t0
    release_pins(spark)
    return dt


def canon(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def main():
    spark = get_session("ab-q4")
    # ---- equality gate ----
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", SF):
        a = canon(old_body(spark, sf))
        b = canon(known_body(spark, sf))
        assert a == b, f"known_keys mismatch at {sf}"
        print(f"equal old==known_keys at {sf}: {len(a)} rows", flush=True)

    # ---- phase profile (old body, warm) ----
    def p1(spark, sf_dir):
        return env_df(spark, sf_dir).select("event_id", "ts", "event_type", "ciphertext", "wrapped_dek", "mac")

    def p2(spark, sf_dir):
        return crypto.decrypt_verify(env_df(spark, sf_dir), strategy="broadcast").select(
            "event_id", "ts", "event_type", "props_decrypted"
        )

    def p_keys(spark, sf_dir):
        return (
            env_df(spark, sf_dir)
            .select(F.col("wrapped_dek").alias("_w"))
            .distinct()
            .withColumn("_dek", crypto.unwrap_dek_udf(F.col("_w")))
        )

    for name, fn in (("p1_envelope", p1), ("p2_decrypt", p2), ("p3_full", old_body), ("p_keys", p_keys)):
        for _ in range(2):
            timed(fn, spark, SF)  # warm
        ts = [timed(fn, spark, SF) for _ in range(REPS)]
        print(f"phase {name}: med {sorted(ts)[len(ts)//2]:.3f} min {min(ts):.3f} all {[round(t,3) for t in ts]}", flush=True)

    # ---- interleaved A/B old vs known_keys vs known+nocp ----
    arms = {"old": old_body, "known": known_body}
    for _ in range(2):
        for fn in arms.values():
            timed(fn, spark, SF)
    res = {k: [] for k in arms}
    res["known_nocp"] = []
    for _ in range(REPS):
        for k, fn in arms.items():
            res[k].append(timed(fn, spark, SF))
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
        try:
            res["known_nocp"].append(timed(known_body, spark, SF))
        finally:
            spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    for k, ts in res.items():
        print(f"arm {k}: med {sorted(ts)[len(ts)//2]:.3f} min {min(ts):.3f} all {[round(t,3) for t in ts]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
