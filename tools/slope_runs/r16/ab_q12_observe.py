"""q12 connected components: fuse the per-round violation count into the
stats pin job via Observation/observe() — VERDICT r15 item 4 (the
"no extra action" form). A/B'd against the shipped loop.

Old loop per round: stats pin job + violations collect job + edges pin.
New loop per round: stats pin job (with observe() metric riding it) +
edges pin — one bounded job fewer per round.

Equality: labels collect-compared at sf0.001/sf0.01/sf0.1 first.
Timing: interleaved A/B at sf0.1 through the registered key's full body
(pair generation included) using a local variant of connected_components.
"""

import os
import sys
import time

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, _REPO)

from pyspark.sql import Observation, functions as F

from dataflow_pubsub_message_encryption_spark.materialize import pin, release_pins
from dataflow_pubsub_message_encryption_spark.operators.dedup import (
    QUERIES as DEDUP_QUERIES,
)
from dataflow_pubsub_message_encryption_spark.operators.graph import (
    connected_components,
)
from dataflow_pubsub_message_encryption_spark.session import get_session

REPS = int(os.environ.get("REPS", "5"))


def cc_observe(pairs, max_rounds=25):
    """connected_components with the violation count observed on the
    stats pin job instead of a separate collect."""
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
    rounds = 0
    for _ in range(max_rounds):
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
        obs = Observation()
        stats_df = sym.groupBy("u").agg(
            F.min("v").alias("mn"),
            F.sum("s").alias("sc"),
            F.sum("t").alias("tc"),
        )
        stats = pin(
            stats_df.observe(
                obs,
                F.sum(
                    F.when(
                        (F.col("sc") > 1)
                        | ((F.col("sc") >= 1) & (F.col("tc") >= 1)),
                        1,
                    ).otherwise(0)
                ).alias("violations"),
            )
        )
        violations = obs.get["violations"]
        if violations is None:
            violations = 0
        if violations == 0:
            break
        rounds += 1
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
    return labels, rounds


def pairs_df(spark, sf):
    return DEDUP_QUERIES["dedup_minhash_lsh_pairs"](spark, sf).select("doc_a", "doc_b")


def canon(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def main():
    spark = get_session("ab-q12")
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        la, ra = connected_components(pairs_df(spark, sf))
        lb, rb = cc_observe(pairs_df(spark, sf))
        ca, cb = canon(la), canon(lb)
        release_pins(spark)
        assert ra == rb, f"round count differs at {sf}: {ra} vs {rb}"
        assert ca == cb, f"labels differ at {sf}"
        print(f"equal at {sf}: {len(ca)} labels, {ra} rounds", flush=True)

    SF = "/root/testdata/sf0.1"

    def run(fn):
        t0 = time.time()
        labels, _ = fn(pairs_df(spark, SF))
        labels.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_pins(spark)
        return dt

    for _ in range(2):
        run(connected_components)
        run(cc_observe)
    old, new = [], []
    for _ in range(REPS):
        old.append(run(connected_components))
        new.append(run(cc_observe))
    print(f"old: med {sorted(old)[len(old)//2]:.3f} min {min(old):.3f} all {[round(t,3) for t in old]}")
    print(f"new: med {sorted(new)[len(new)//2]:.3f} min {min(new):.3f} all {[round(t,3) for t in new]}")
    spark.stop()


if __name__ == "__main__":
    main()
