"""Graph-ANN walk: distance-carrying edges (round-16 candidate, VERDICT
r15 item 3 — attack the 9-hop walk floor).

Idea: every hop today joins the ≤beam frontier against the pinned node
table and re-evaluates the interpreted 64-element distance fold against
the broadcast probe (5 operators/hop). The probe distance of a node is
execution-invariant, so compute it ONCE (nd = nodes x probe, exact int64
fold) and attach it to the pinned edge tables (dst side) and the frontier
rows; each hop is then frontier ∪ N(frontier) -> distinct -> top-beam by
(pd, vec_id) — no per-hop nodes join, no crossJoin, no fold. The final
2-hop rerank reads pd off the edges the same way. Same arithmetic, same
rank rule, so the walk visits identical beams and the top-k is identical
row for row (asserted below at 3 SFs for all 3 registered keys).

A/B: interleaved, full registered key bodies at sf0.1.
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, _REPO)

from pyspark.sql import Window, functions as F

import dataflow_pubsub_message_encryption_spark.operators.similarity as sim
from dataflow_pubsub_message_encryption_spark.materialize import release_pins
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.sources import load

REPS = int(os.environ.get("REPS", "5"))


def grb_edges_all_d(scored, nd):
    """_grb_edges_all with the dst's probe distance attached inside the
    one pin job (one shuffle_hash join added; same window, same keep)."""
    tagged = None
    for l in sim._GR_LEVELS:
        sub = scored.filter(
            (F.col("src_lvl") >= l) & (F.col("dst_lvl") >= l)
        ).select(F.lit(l).alias("walk_lvl"), "src", "dst", "d")
        tagged = sub if tagged is None else tagged.unionByName(sub)
    w = Window.partitionBy("walk_lvl", "src").orderBy("d", "dst")
    ndd = nd.select(F.col("vec_id").alias("dst"), F.col("pd"))
    allr = (
        tagged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= sim._GR_M)
        .select("walk_lvl", "src", "dst")
        .join(ndd.hint("shuffle_hash"), "dst")
        .select("walk_lvl", "src", "dst", "pd")
        .localCheckpoint()
    )
    return {
        l: allr.filter(F.col("walk_lvl") == l).select("src", "dst", "pd")
        for l in sim._GR_LEVELS
    }


def gr_search_d(nd, edges):
    """_gr_search over distance-carrying edges: hops never touch vectors."""
    cur = (
        nd.orderBy(F.desc("lvl"), "vec_id").limit(1).select("vec_id", "pd")
    )
    for l in sim._GR_LEVELS:
        for _ in range(sim._GR_HOPS):
            e = edges[l]
            curk = cur.select(F.col("vec_id").alias("_cv"))
            nb = e.join(curk, F.col("src") == F.col("_cv")).select(
                F.col("dst").alias("vec_id"), F.col("pd")
            )
            frontier = cur.select("vec_id", "pd").union(nb).distinct()
            cur = (
                frontier.orderBy("pd", "vec_id")
                .limit(sim._GR_BEAM)
                .localCheckpoint()
            )
    e0 = edges[0]
    curk = cur.select(F.col("vec_id").alias("_cv"))
    hop1 = e0.join(curk, F.col("src") == F.col("_cv")).select(
        F.col("dst").alias("vec_id"), F.col("pd")
    )
    ea = e0.select(F.col("src").alias("s1"), F.col("dst").alias("d1"))
    eb = e0.select(
        F.col("src").alias("s2"), F.col("dst").alias("d2"), F.col("pd")
    )
    hop2 = (
        curk.join(ea, F.col("_cv") == F.col("s1"))
        .join(eb, F.col("d1") == F.col("s2"))
        .select(F.col("d2").alias("vec_id"), F.col("pd"))
    )
    cand = cur.select("vec_id", "pd").union(hop1).union(hop2).distinct()
    return (
        cand.orderBy("pd", "vec_id")
        .limit(sim._TOPK)
        .select("vec_id", F.col("pd").alias("idist"))
    )


def gr_blocked_d(spark, sf_dir, tables=None):
    e = load(spark, sf_dir, "embeddings")

    def _mk_nodes():
        return sim._gr_nodes(
            e.filter(F.col("vec_id") != sim._PROBE_ID), blocked=True, tables=tables
        ).localCheckpoint()

    def _mk_probe():
        return (
            e.filter(F.col("vec_id") == sim._PROBE_ID)
            .select(
                F.transform(
                    sim.as_double("embedding"),
                    lambda x: F.round(x * sim._CENT_SCALE).cast("long"),
                ).alias("pq")
            )
            .localCheckpoint()
        )

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _fn, _fp = _pool.submit(_mk_nodes), _pool.submit(_mk_probe)
        nodes, probe = _fn.result(), _fp.result()
    scored = sim._grb_scored_pairs_arrow(nodes).localCheckpoint()
    nd = nodes.crossJoin(F.broadcast(probe)).select(
        "vec_id", "lvl", sim._gr_isq(F.col("qe"), F.col("pq")).alias("pd")
    )
    edges = grb_edges_all_d(scored, nd)
    return gr_search_d(nd, edges)


def blocked_new(spark, sf_dir):
    return gr_blocked_d(spark, sf_dir)


def wide_new(spark, sf_dir):
    return gr_blocked_d(spark, sf_dir, tables=sim._GRB_WIDE_TABLES)


def auto_new(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    n = e.filter(F.col("vec_id") != sim._PROBE_ID).count()
    bits = sim._grb_auto_bits(n)
    return gr_blocked_d(spark, sf_dir, tables=((0, bits), (bits, 2 * bits)))


PAIRS = [
    ("blocked", "sim_ann_graph_topk_blocked", blocked_new),
    ("wide", "sim_ann_graph_topk_blocked_wide", wide_new),
    ("auto", "sim_ann_graph_topk_blocked_auto", auto_new),
]


def canon(df):
    return [tuple(map(repr, r)) for r in df.collect()]


def main():
    from dataflow_pubsub_message_encryption_spark.operators import registry

    queries, _ = registry()
    spark = get_session("ab-grwalk")
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        for name, key, newfn in PAIRS:
            a = canon(queries[key](spark, sf))
            release_pins(spark)
            b = canon(newfn(spark, sf))
            release_pins(spark)
            assert a == b, f"{name} mismatch at {sf}:\nold={a}\nnew={b}"
            print(f"equal {name} at {sf}: {len(a)} rows", flush=True)

    SF = "/root/testdata/sf0.1"

    def run(fn):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_pins(spark)
        return dt

    for name, key, newfn in PAIRS:
        oldfn = queries[key]
        for _ in range(2):
            run(oldfn)
            run(newfn)
        old, new = [], []
        for _ in range(REPS):
            old.append(run(oldfn))
            new.append(run(newfn))
        print(
            f"{name}: old med {sorted(old)[len(old)//2]:.3f} min {min(old):.3f} {[round(t,3) for t in old]} | "
            f"new med {sorted(new)[len(new)//2]:.3f} min {min(new):.3f} {[round(t,3) for t in new]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
