"""Targeted per-query timing for the optimization round: same methodology
as bench.py (2 untimed warm passes, 3 timed, median + min, noop sink,
release_pins between queries) over an explicit key list — so a change's
before/after can be measured without paying the full 38-query mix.

Usage: python tools/slope_runs/r15opt/time_subset.py KEY [KEY...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

keys = sys.argv[1:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import release_pins

queries, _ = registry()
spark = get_session("time-subset")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()


def run(key):
    queries[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_pins(spark)


for _ in range(2):
    for k in keys:
        run(k)
samples = {k: [] for k in keys}
for _ in range(3):
    for k in keys:
        t0 = time.time()
        run(k)
        samples[k].append(time.time() - t0)
out = {
    k: {"med": round(statistics.median(v), 3), "min": round(min(v), 3)}
    for k, v in samples.items()
}
print(json.dumps({"sf_dir": sf_dir, "queries": out,
                  "loadavg": os.getloadavg()[0]}))
