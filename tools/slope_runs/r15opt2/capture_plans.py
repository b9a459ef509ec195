"""Capture formatted plans for named registry keys into plans/r15/.

Usage: python tools/slope_runs/r15opt2/capture_plans.py <suffix> key [key ...]
Writes plans/r15/<key>_<suffix>.txt for each key (sf0.1 inputs).
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main():
    suffix, keys = sys.argv[1], sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dataflow_pubsub_message_encryption_spark.operators import registry
    from dataflow_pubsub_message_encryption_spark.plans import formatted_plan

    queries, _ = registry()
    for k in keys:
        df = queries[k](spark, "/root/testdata/sf0.1")
        path = f"/root/repo/plans/r15/{k}_{suffix}.txt"
        open(path, "w").write(formatted_plan(df))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
