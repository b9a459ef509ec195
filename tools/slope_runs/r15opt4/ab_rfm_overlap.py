"""A/B: rfm_segmentation_scalable (q17) -- overlap the three independent
_global_rank passes (guide section 2.6: actions are only sequential
because the driver calls them sequentially).

Each score() call runs two eager jobs (range-pin + bounded offsets
collect) before returning a lazy frame; the shipped body runs the three
calls back-to-back, so 6 small jobs serialize on a mostly-idle box. The
variant submits the three calls to a 3-thread pool -- the jobs overlap,
the composition and result are unchanged (each pass is deterministic and
independent; the final 3-way join is built after all three return).

Equality at all three SFs first, then interleaved timing on both layouts.
"""
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.materialize import release_pins
from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators.scale import (
    _global_rank,
    _ntile_from_rank,
    dec4,
    money,
)
from dataflow_pubsub_message_encryption_spark.sources import load
from dataflow_pubsub_message_encryption_spark.session import get_session

queries, _ = registry()
OLD = queries["rfm_segmentation_scalable"]


def NEW(spark, sf_dir):
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(dec4("o_totalprice")).alias("monetary"),
        )
        .localCheckpoint()
    )

    def score(order_col, name):
        ranked, n = _global_rank(
            per_cust.select("o_custkey", order_col.alias("_k")),
            F.desc("_k"),
            F.col("o_custkey"),
        )
        return ranked.select(
            "o_custkey",
            _ntile_from_rank(F.col("rk"), n, 5).alias(name),
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        fr = pool.submit(score, F.col("last_order"), "r_score")
        ff = pool.submit(score, F.col("frequency"), "f_score")
        fm = pool.submit(score, F.col("monetary"), "m_score")
        r_s, f_s, m_s = fr.result(), ff.result(), fm.result()

    scored = (
        per_cust.join(r_s, "o_custkey")
        .join(f_s, "o_custkey")
        .join(m_s, "o_custkey")
    )
    seg = (
        F.when(
            (F.col("r_score") == 1)
            & (F.col("f_score") <= 2)
            & (F.col("m_score") <= 2),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 3), "loyal")
        .when(
            (F.col("r_score") >= 4) & (F.col("m_score") <= 2),
            "at_risk_big_spender",
        )
        .when(F.col("r_score") >= 4, "dormant")
        .otherwise("regular")
    )
    return scored.select(
        "o_custkey",
        "frequency",
        money("monetary").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    )


if __name__ == "__main__":
    spark = get_session("ab-rfm-overlap")

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
