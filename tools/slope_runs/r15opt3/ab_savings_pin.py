"""A/B: corpus_dedup_savings_report — pin the narrow stage tables.

OLD: s1 (the sha2 exact-dedup groupBy over the corpus) is instantiated
2x (the near-dup chain + its own census row) and s1c (s1 join the
components labels) 2x (cluster-min + keep filter) — the full-text sha2
aggregate and the components join each run twice (8 documents scans).
NEW: pin s1 (doc_id, n_chars — 12 B/row) and s1c (+cluster_id) so every
stage computes once.

Equality at all three SFs, then interleaved 7-rep timing single-file
(the key is not in the bench mix; multifile run too for the record).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators.graph import QUERIES
from dataflow_pubsub_message_encryption_spark.sources import load
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import pin, release_pins

queries, _ = registry()
OLD = queries["corpus_dedup_savings_report"]


def NEW(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    s1 = pin(
        docs.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select("doc_id", "n_chars")
    )
    comp = QUERIES["dedup_cluster_components"](spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    s1c = pin(s1.join(comp, "doc_id", "left"))
    cmin = (
        s1c.filter(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    keep = s1c.join(F.broadcast(cmin), "cluster_id", "left").filter(
        F.col("keep_id").isNull() | (F.col("doc_id") == F.col("keep_id"))
    )

    def census(df, idx, name):
        return df.agg(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
        )

    stages = (
        census(docs.select("n_chars"), 0, "raw")
        .unionByName(census(s1, 1, "exact_dedup"))
        .unionByName(census(keep, 2, "near_dedup"))
    )
    raw = docs.agg(F.sum("n_chars").cast("long").alias("raw_bytes"))
    return stages.crossJoin(F.broadcast(raw)).select(
        "stage_idx",
        "stage",
        "n_docs",
        "n_bytes",
        F.expr(
            "CAST((raw_bytes - n_bytes) * 1000000 DIV raw_bytes AS BIGINT)"
        ).alias("savings_ppm"),
    )


if __name__ == "__main__":
    spark = get_session("ab-savings-pin")

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
