"""A/B: _global_adjacent_pairs boundary stitching -- ONE bounded collect
instead of two (the lasts and firsts collects are both <= _N_RANGE-row
filters over the same pinned marked table; a single OR-filter job returns
both sets and the driver classifies, halving the boundary-job count).
Consumers: dedup_span_suffix_array (q23), dedup_span_suffix_doubling.

Equality of the full q23/doubling outputs at all three SFs, then
interleaved timing on both layouts.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from dataflow_pubsub_message_encryption_spark.materialize import pin, release_pins
from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators import scale as SC
from dataflow_pubsub_message_encryption_spark.session import get_session

queries, _ = registry()


def _adj_one_collect(df, order_cols, keep):
    spark = df.sparkSession
    w = Window.partitionBy("pid").orderBy(*order_cols)
    marked = pin(
        df.repartitionByRange(SC._N_RANGE, *order_cols)
        .withColumn("pid", F.spark_partition_id())
        .select(
            "pid",
            *keep,
            F.row_number().over(w).alias("_rn"),
            F.lead(F.lit(1)).over(w).alias("_has_next"),
            *[F.lead(c).over(w).alias(f"_n_{c}") for c in keep],
        )
    )
    within = marked.filter(F.col("_has_next").isNotNull()).select(
        *[F.col(c).alias(f"{c}_l") for c in keep],
        *[F.col(f"_n_{c}").alias(f"{c}_r") for c in keep],
    )
    rows_b = marked.filter(
        F.col("_has_next").isNull() | (F.col("_rn") == 1)
    ).select("pid", "_rn", "_has_next", *keep).collect()
    lasts = sorted((r for r in rows_b if r["_has_next"] is None),
                   key=lambda r: r["pid"])
    firsts = sorted((r for r in rows_b if r["_rn"] == 1),
                    key=lambda r: r["pid"])
    fields = [
        T.StructField(f"{c}_{side}", df.schema[c].dataType)
        for side in ("l", "r")
        for c in keep
    ]
    rows = [
        tuple([lt[c] for c in keep] + [ft[c] for c in keep])
        for lt, ft in zip(lasts[:-1], firsts[1:])
    ]
    boundary = spark.createDataFrame(rows, T.StructType(fields))
    return within.unionByName(boundary)


def _patched(key):
    def run(spark, sf):
        orig = SC._global_adjacent_pairs
        SC._global_adjacent_pairs = _adj_one_collect
        try:
            import dataflow_pubsub_message_encryption_spark.operators.dedup as DD
            had = getattr(DD, "_global_adjacent_pairs", None)
            if had is not None:
                DD._global_adjacent_pairs = _adj_one_collect
            try:
                return queries[key](spark, sf)
            finally:
                if had is not None:
                    DD._global_adjacent_pairs = had
        finally:
            SC._global_adjacent_pairs = orig
    return run


KEYS = ["dedup_span_suffix_array", "dedup_span_suffix_doubling"]

if __name__ == "__main__":
    spark = get_session("ab-adj-one-collect")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        for key in KEYS:
            a = sorted(map(tuple, queries[key](spark, sf).collect()))
            release_pins(spark)
            b = sorted(map(tuple, _patched(key)(spark, sf).collect()))
            release_pins(spark)
            print(f"{sf} {key} equal: {a == b} ({len(a)} rows)", flush=True)
            assert a == b

    def timed(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        release_pins(spark)
        return time.time() - t0

    for sf in ("/root/testdata/sf0.1",
               "/root/repo/spark-warehouse/sf0.1-multifile"):
        for key in KEYS:
            old_fn, new_fn = queries[key], _patched(key)
            for _ in range(2):
                timed(old_fn, sf); timed(new_fn, sf)
            olds, news = [], []
            for _ in range(5):
                olds.append(timed(old_fn, sf))
                news.append(timed(new_fn, sf))
            print(f"{sf} {key}\n  old {['%.2f' % t for t in olds]} med {statistics.median(olds):.2f} min {min(olds):.2f}"
                  f"\n  new {['%.2f' % t for t in news]} med {statistics.median(news):.2f} min {min(news):.2f}",
                  flush=True)
