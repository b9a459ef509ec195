"""A/B: text_tfidf_keywords_topk — derive nd and df from the (doc, term)
frequency table instead of two more token-grain passes.

OLD: d (scan + tokenize + explode) instantiated 3x — tf groupBy, the
global nd count_distinct, and the per-term df count_distinct.
NEW (shipped): nd == count_distinct(doc_id) over tf (every doc with >=1
token has a tf row) and df == count(*) per term over tf (tf rows are
unique per (doc_id, term)) — exact identities; all three consumers share
tf's one aggregation exchange via runtime stage reuse.

Equality collect-compare at all three SFs first, then interleaved 7-rep
timing on both layouts (key not in the bench mix, so this log is its
before/after record).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators.text import (
    _KW_K,
    load,
    tokens,
)
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import release_pins

queries, _ = registry()
NEW = queries["text_tfidf_keywords_topk"]  # the shipped form


def OLD(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = d.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    nd = d.agg(F.count_distinct("doc_id").alias("nd"))
    idf = (
        d.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(nd))
        .select(
            "term",
            F.round(
                F.log(F.col("nd").cast("double") / F.col("df"))
                * 1_000_000_000
            )
            .cast("long")
            .alias("w"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.col("tf") * F.col("w")), "term"
    )
    return (
        tf.join(idf, "term")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _KW_K)
        .select(
            "doc_id",
            "rk",
            "term",
            (F.col("tf") * F.col("w")).cast("long").alias("score"),
        )
    )


if __name__ == "__main__":
    spark = get_session("ab-tfidf-nv")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        a = sorted(map(tuple, OLD(spark, sf).collect()))
        b = sorted(map(tuple, NEW(spark, sf).collect()))
        print(f"{sf} outputs equal: {a == b} ({len(a)} rows)", flush=True)
        assert a == b
        release_pins(spark)

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
