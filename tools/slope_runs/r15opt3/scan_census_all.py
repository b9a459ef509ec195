"""Scan-count census over the ENTIRE registry (342 keys, sf0.01 inputs):
for each key, count `Scan parquet` nodes per source table in the static
formatted plan, flag keys whose DOCUMENTS/EMBEDDINGS/LINEITEM scan count
is highest — the repeat-instantiation offenders the r15-opt derivation/
pin rewrites target. Static counts overstate runtime work where AQE
stage reuse dedupes, but they rank the candidates.
"""
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.plans import formatted_plan
from dataflow_pubsub_message_encryption_spark.materialize import release_pins

queries, _ = registry()
rows = []
for k, fn in queries.items():
    try:
        plan = formatted_plan(fn(spark, "/root/testdata/sf0.01"))
    except Exception as e:  # noqa: BLE001 — census, not a gate
        print(f"SKIP {k}: {type(e).__name__}", flush=True)
        continue
    locs = Counter(re.findall(r"Location:.*?/(\w+)\.parquet", plan))
    total = sum(locs.values())
    big = max(locs.values()) if locs else 0
    rows.append((big, total, k, dict(locs)))
    release_pins(spark)

rows.sort(reverse=True)
for big, total, k, locs in rows[:40]:
    print(f"max-per-table {big:3d} total {total:3d}  {k}  {locs}", flush=True)
spark.stop()
