"""A/B: per-hop pin vs pin-every-2-hops in the graph-ANN beam walk.

The walk is ~3.0 s of each graph key (9 sequential bounded jobs). The
first optimization session measured and rejected two walk rewrites
(literal-beam feedback: Janino cache misses; node repartition: task
storms). This probes the remaining knob: pinning every SECOND hop halves
the job count; the unpinned hop's subtree is inlined twice in the next
step's plan (each step references its predecessor in both the neighbor
join and the frontier union), so the saved job is paid for with one
duplicated tiny-subtree execution + a deeper plan to compile.

Interleaved A/B over the full blocked key at sf0.1 + exact output check.
Run: python tools/slope_runs/r15opt2/ab_walk_pin_cadence.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.materialize import release_pins
from dataflow_pubsub_message_encryption_spark.operators import similarity as S
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.sources import load


def gr_search_cadence(nodes, probe, edges, pin_every=2):
    cur = nodes.orderBy(F.desc("lvl"), "vec_id").limit(1).select("vec_id")
    hop = 0
    for l in S._GR_LEVELS:
        for _ in range(S._GR_HOPS):
            cur = S._gr_step(cur, edges[l], nodes, probe)
            hop += 1
            if hop % pin_every == 0:
                cur = cur.localCheckpoint()
    if hop % pin_every != 0:
        cur = cur.localCheckpoint()
    e0 = edges[0]
    hop1 = cur.join(e0, cur["vec_id"] == e0["src"]).select(
        F.col("dst").alias("vec_id")
    )
    ea, eb = e0.alias("ea"), e0.alias("eb")
    hop2 = (
        cur.join(ea, cur["vec_id"] == F.col("ea.src"))
        .join(eb, F.col("ea.dst") == F.col("eb.src"))
        .select(F.col("eb.dst").alias("vec_id"))
    )
    cand = cur.select("vec_id").union(hop1).union(hop2).distinct()
    return (
        cand.join(nodes.select("vec_id", "qe"), "vec_id")
        .crossJoin(F.broadcast(probe))
        .select("vec_id", S._gr_isq(F.col("qe"), F.col("pq")).alias("idist"))
        .orderBy("idist", "vec_id")
        .limit(S._TOPK)
    )


def build(spark, sf):
    e = load(spark, sf, "embeddings")
    nodes = S._gr_nodes(
        e.filter(F.col("vec_id") != S._PROBE_ID), blocked=True
    ).localCheckpoint()
    probe = (
        e.filter(F.col("vec_id") == S._PROBE_ID)
        .select(
            F.transform(
                S.as_double("embedding"),
                lambda x: F.round(x * S._CENT_SCALE).cast("long"),
            ).alias("pq")
        )
        .localCheckpoint()
    )
    scored = S._grb_scored_pairs_arrow(nodes).localCheckpoint()
    edges = S._grb_edges_all(scored)
    return nodes, probe, edges


def main():
    spark = get_session("ab-walk")
    sf = "/root/testdata/sf0.1"
    spark.read.parquet(f"{sf}/embeddings.parquet").count()

    # exactness first, at both graded fixtures, both cadences
    for fx in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        nodes, probe, edges = build(spark, fx)
        a = sorted(map(tuple, S._gr_search(nodes, probe, edges).collect()))
        for ce in (2, 3):
            b = sorted(
                map(
                    tuple,
                    gr_search_cadence(nodes, probe, edges, pin_every=ce).collect(),
                )
            )
            print(fx, f"cadence-{ce} outputs equal:", a == b)
            assert a == b
        release_pins(spark)

    res = {"per-hop": [], "every-2": [], "every-3": []}
    # warm all shapes
    nodes, probe, edges = build(spark, sf)
    S._gr_search(nodes, probe, edges).write.format("noop").mode("overwrite").save()
    for ce in (2, 3):
        gr_search_cadence(nodes, probe, edges, pin_every=ce).write.format(
            "noop"
        ).mode("overwrite").save()
    for rep in range(5):
        t0 = time.time()
        S._gr_search(nodes, probe, edges).write.format("noop").mode(
            "overwrite"
        ).save()
        res["per-hop"].append(time.time() - t0)
        for ce, key in ((2, "every-2"), (3, "every-3")):
            t0 = time.time()
            gr_search_cadence(nodes, probe, edges, pin_every=ce).write.format(
                "noop"
            ).mode("overwrite").save()
            res[key].append(time.time() - t0)
    for k, v in res.items():
        print(k, [f"{t:.2f}" for t in v], "med", f"{statistics.median(v):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
