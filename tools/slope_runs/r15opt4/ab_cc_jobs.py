"""A/B: dedup_cluster_components (q12) per-round job-count reductions.

V0 = shipped loop (pin(nodes) eager; pin(stats) then a separate
     violations-count job; pin(edges) per round -> 3 jobs/round + 2 setup
     pins).
V1 = drop the ONCE-consumed nodes pin (nodes is only read by the final
     labels join, and its lineage is one select/union/distinct over the
     pinned initial edges -- pinning a once-consumed short-lineage table
     is a pure extra job + block write).
V2 = V1 + fuse the stats materialization with the violations count:
     persist(stats) and let the violations aggregate BE the materializing
     action (one job instead of pin-job + collect-job; lineage above
     stats is one groupBy over the round's pinned edges, so truncation
     is not needed for plan growth -- the edges pin still truncates the
     recursive chain every round).

Equality on the full q12 output at all three SFs first, then interleaved
timing at sf0.1 on both layouts.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.materialize import pin, release_pins
from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators.graph import (
    _DEDUP_QUERIES,
    _MAX_ROUNDS,
)
from dataflow_pubsub_message_encryption_spark.session import get_session

queries, _ = registry()
V0 = queries["dedup_cluster_components"]


def _cc(pairs, fuse_stats: bool, pin_nodes: bool):
    a, b = pairs.columns[0], pairs.columns[1]
    edges = pin(
        pairs.select(F.col(a).cast("long").alias("x"), F.col(b).cast("long").alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
        .distinct()
    )
    nodes = (
        edges.select(F.col("u").alias("node")).union(edges.select("v")).distinct()
    )
    if pin_nodes:
        nodes = pin(nodes)
    for _ in range(_MAX_ROUNDS):
        sym = edges.select(
            "u", "v", F.lit(1).alias("s"), F.lit(0).alias("t")
        ).unionByName(
            edges.select(
                F.col("v").alias("u"),
                F.col("u").alias("v"),
                F.lit(0).alias("s"),
                F.lit(1).alias("t"),
            )
        )
        stats = sym.groupBy("u").agg(
            F.min("v").alias("mn"),
            F.sum("s").alias("sc"),
            F.sum("t").alias("tc"),
        )
        if fuse_stats:
            stats = stats.persist()
        else:
            stats = pin(stats)
        violations = stats.filter(
            (F.col("sc") > 1) | ((F.col("sc") >= 1) & (F.col("tc") >= 1))
        ).agg(F.count("*")).collect()[0][0]
        if violations == 0:
            break
        mins = stats.select("u", F.least("u", "mn").alias("m"))
        large = (
            sym.select("u", "v")
            .join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("n"), "m")
            .unionByName(mins2.select(F.col("u").alias("n"), "m"))
        )
        edges = pin(
            small.filter(F.col("n") != F.col("m"))
            .select(F.greatest("n", "m").alias("u"), F.least("n", "m").alias("v"))
            .distinct()
        )
    labels = nodes.join(
        edges.groupBy("u").agg(F.min("v").alias("lbl")),
        nodes.node == F.col("u"),
        "left",
    ).select("node", F.coalesce("lbl", "node").alias("lbl"))
    return labels


def _q12(spark, sf_dir, fuse_stats, pin_nodes):
    pairs = _DEDUP_QUERIES["dedup_minhash_lsh_pairs"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    labels = _cc(pairs, fuse_stats, pin_nodes)
    comp = labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return comp.join(F.broadcast(sizes), "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def V1(spark, sf_dir):
    return _q12(spark, sf_dir, fuse_stats=False, pin_nodes=False)


def V2(spark, sf_dir):
    return _q12(spark, sf_dir, fuse_stats=True, pin_nodes=False)


if __name__ == "__main__":
    spark = get_session("ab-cc-jobs")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        ref = sorted(map(tuple, V0(spark, sf).collect()))
        release_pins(spark)
        for name, fn in (("V1", V1), ("V2", V2)):
            got = sorted(map(tuple, fn(spark, sf).collect()))
            release_pins(spark)
            print(f"{sf} {name} equal: {got == ref} ({len(ref)} rows)", flush=True)
            assert got == ref

    def timed(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        release_pins(spark)
        return time.time() - t0

    for sf in ("/root/testdata/sf0.1",
               "/root/repo/spark-warehouse/sf0.1-multifile"):
        for _ in range(2):
            timed(V0, sf); timed(V1, sf); timed(V2, sf)
        t = {"V0": [], "V1": [], "V2": []}
        for _ in range(7):
            t["V0"].append(timed(V0, sf))
            t["V1"].append(timed(V1, sf))
            t["V2"].append(timed(V2, sf))
        for name, xs in t.items():
            print(f"{sf} {name} {['%.2f' % x for x in xs]} "
                  f"med {statistics.median(xs):.2f} min {min(xs):.2f}", flush=True)
