"""A/B: graph_degree_histogram — the module-standard und pin (this body
was the one und site missing it; 16 documents scans -> 4 + pin).
OLD reconstructed verbatim without the pin; equality at all three SFs,
then interleaved 7-rep timing (key not in the bench mix)."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators.graph import (
    _DEDUP_QUERIES,
    _DH_CAP,
)
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import release_pins

queries, _ = registry()
NEW = queries["graph_degree_histogram"]


def OLD(spark, sf_dir):
    pairs = _DEDUP_QUERIES["dedup_minhash_lsh_pairs"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    und = (
        pairs.filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("d"))
    )
    bucket = F.when(F.col("d") <= 1, 0)
    for k in range(1, _DH_CAP):
        bucket = bucket.when(F.col("d") <= (1 << k), k)
    bucket = bucket.otherwise(_DH_CAP)
    tot = deg.agg(F.count("*").cast("long").alias("n"))
    return (
        deg.select(bucket.cast("long").alias("bucket"), "d")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.min("d").cast("long").alias("min_deg"),
            F.max("d").cast("long").alias("max_deg"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_nodes",
            "min_deg",
            "max_deg",
            F.expr("CAST(n_nodes * 1000000 DIV n AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


if __name__ == "__main__":
    spark = get_session("ab-histogram-pin")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        a = sorted(map(tuple, OLD(spark, sf).collect()))
        release_pins(spark)
        b = sorted(map(tuple, NEW(spark, sf).collect()))
        release_pins(spark)
        print(f"{sf} outputs equal: {a == b} ({len(a)} rows)", flush=True)
        assert a == b

    def timed(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        release_pins(spark)
        return time.time() - t0

    for sf in ("/root/testdata/sf0.1",
               "/root/repo/spark-warehouse/sf0.1-multifile"):
        for _ in range(2):
            timed(OLD, sf); timed(NEW, sf)
        olds, news = [], []
        for _ in range(7):
            olds.append(timed(OLD, sf))
            news.append(timed(NEW, sf))
        print(f"{sf}\n  old {['%.2f' % t for t in olds]} med {statistics.median(olds):.2f} min {min(olds):.2f}"
              f"\n  new {['%.2f' % t for t in news]} med {statistics.median(news):.2f} min {min(news):.2f}",
              flush=True)
