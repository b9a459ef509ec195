"""A/B: spark.sql.codegen.cache.maxEntries (static conf, default 100)
across the FULL 38-query mix.

Hypothesis: the bench mix compiles far more than 100 distinct
whole-stage-codegen sources per pass (38 queries x ~5-15 codegen stages),
so the default LRU evicts everything every pass and the 'warm' passes
never amortize Janino compilation -- the documented in-mix vs solo-warm
gap (q12 7.8 in-mix vs ~5 solo; q8 2.7 vs ~1.0 warm profile) is exactly
the signature. A long-lived cluster serving a workload of N distinct
queries hits the same thrash, so the fix is scale-honest, not
fixture-tuned.

Method: one session per arm (static conf -- needs its own JVM), 1 warm
pass + 2 timed passes over the full HEADLINE mix, single-file layout.
Run arm given by argv[1]: 'default' or 'big'.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

arm = sys.argv[1]
sf_dir = "/root/testdata/sf0.1"

from pyspark.sql import SparkSession

from bench import HEADLINE
from dataflow_pubsub_message_encryption_spark.materialize import release_pins
from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.session import RUNTIME_CONFS

builder = (
    SparkSession.builder.master("local[32]")
    .appName(f"ab-codegen-{arm}")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
)
if arm == "big":
    builder = builder.config("spark.sql.codegen.cache.maxEntries", "4096")
for k, v in RUNTIME_CONFS.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
try:
    print("cache.maxEntries =", spark.conf.get("spark.sql.codegen.cache.maxEntries"))
except Exception as e:
    print("conf read failed:", e)

queries, _ = registry()
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()


def run(key):
    queries[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_pins(spark)


for _, key in HEADLINE:
    run(key)  # warm pass 1
t_pass = []
per_q = {}
for p in range(2):
    tp0 = time.time()
    for label, key in HEADLINE:
        t0 = time.time()
        run(key)
        per_q.setdefault(label, []).append(round(time.time() - t0, 3))
    t_pass.append(round(time.time() - tp0, 2))
print(json.dumps({"arm": arm, "pass_totals": t_pass, "per_q": per_q,
                  "loadavg": os.getloadavg()[0]}))
