"""A/B: graph-ANN build -- overlap the independent nodes and probe pins
(guide section 2.6, the q17 precedent). The two localCheckpoints at the
top of `_gr_blocked` are independent (both read only the embeddings
scan) but run back-to-back; a 2-thread pool overlaps the two eager jobs.

Equality for all three keys at all three SFs, then interleaved timing
at sf0.1 on both layouts for blocked + auto.
"""
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.materialize import release_pins
from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators import similarity as S
from dataflow_pubsub_message_encryption_spark.sources import load
from dataflow_pubsub_message_encryption_spark.session import get_session

queries, _ = registry()


def _gr_blocked_overlap(spark, sf_dir, tables=None):
    e = load(spark, sf_dir, "embeddings")

    def mk_nodes():
        return S._gr_nodes(
            e.filter(F.col("vec_id") != S._PROBE_ID), blocked=True, tables=tables
        ).localCheckpoint()

    def mk_probe():
        return (
            e.filter(F.col("vec_id") == S._PROBE_ID)
            .select(
                F.transform(
                    S.as_double("embedding"),
                    lambda x: F.round(x * S._CENT_SCALE).cast("long"),
                ).alias("pq")
            )
            .localCheckpoint()
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        fn_, fp_ = pool.submit(mk_nodes), pool.submit(mk_probe)
        nodes, probe = fn_.result(), fp_.result()
    scored = S._grb_scored_pairs_arrow(nodes).localCheckpoint()
    edges = S._grb_edges_all(scored)
    return S._gr_search(nodes, probe, edges)


def _auto_overlap(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    n = e.filter(F.col("vec_id") != S._PROBE_ID).count()
    bits = S._grb_auto_bits(n)
    return _gr_blocked_overlap(spark, sf_dir, tables=((0, bits), (bits, 2 * bits)))


NEW = {
    "sim_ann_graph_topk_blocked": lambda s, sf: _gr_blocked_overlap(s, sf),
    "sim_ann_graph_topk_blocked_wide": lambda s, sf: _gr_blocked_overlap(
        s, sf, tables=S._GRB_WIDE_TABLES
    ),
    "sim_ann_graph_topk_blocked_auto": _auto_overlap,
}

if __name__ == "__main__":
    spark = get_session("ab-gr-pin-overlap")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        for key, new_fn in NEW.items():
            a = [tuple(r) for r in queries[key](spark, sf).collect()]
            release_pins(spark)
            b = [tuple(r) for r in new_fn(spark, sf).collect()]
            release_pins(spark)
            print(f"{sf} {key} equal: {a == b}", flush=True)
            assert a == b

    def timed(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        release_pins(spark)
        return time.time() - t0

    for key in ("sim_ann_graph_topk_blocked", "sim_ann_graph_topk_blocked_auto"):
        old_fn, new_fn = queries[key], NEW[key]
        for sf in ("/root/testdata/sf0.1",
                   "/root/repo/spark-warehouse/sf0.1-multifile"):
            for _ in range(2):
                timed(old_fn, sf); timed(new_fn, sf)
            olds, news = [], []
            for _ in range(5):
                olds.append(timed(old_fn, sf))
                news.append(timed(new_fn, sf))
            print(f"{key} @ {sf}\n  old {['%.2f' % t for t in olds]} med {statistics.median(olds):.2f} min {min(olds):.2f}"
                  f"\n  new {['%.2f' % t for t in news]} med {statistics.median(news):.2f} min {min(news):.2f}",
                  flush=True)
