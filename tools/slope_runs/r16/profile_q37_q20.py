"""Phase profiles for q37 (dedup_semdedup_cells) and q20
(dedup_weighted_jaccard) at sf0.1 — VERDICT r15 items 5 and 8: measure
before touching (guide §1.2).

q37 phases: e_q pin | driver train | assign pass | base pin | pair pass
(pre-tau, noop) | full key.
q20 phases: dt pin job | per-doc sums | inter self-join | full key.
"""

import os
import sys
import time

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

import dataflow_pubsub_message_encryption_spark.operators.similarity as sim
import dataflow_pubsub_message_encryption_spark.operators.dedup as dd
from dataflow_pubsub_message_encryption_spark.materialize import release_pins
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.sources import load

REPS = int(os.environ.get("REPS", "5"))
SF = "/root/testdata/sf0.1"


def profile(name, fn, spark):
    # NOTE: pins are NOT released between reps — several phases share
    # eager pins (e_q, base, dt) built once outside the timed body;
    # releasing would orphan them (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    # The handful of accumulated fixture-scale pins is harmless here.
    for _ in range(2):
        fn()
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(
        f"{name}: med {sorted(ts)[len(ts)//2]:.3f} min {min(ts):.3f} "
        f"{[round(t,3) for t in ts]}",
        flush=True,
    )


def main():
    spark = get_session("profile-q37-q20")
    from dataflow_pubsub_message_encryption_spark.operators import registry

    queries, _ = registry()

    # ---------- q37 ----------
    e = load(spark, SF, "embeddings")
    n = e.count()
    k = sim._sd_auto_k(n)
    stride = sim._km_auto_stride(n, k)
    print(f"q37 params: n={n} k={k} stride={stride}", flush=True)

    def mk_eq():
        return (
            load(spark, SF, "embeddings")
            .repartition(spark.sparkContext.defaultParallelism)
            .select(
                "vec_id",
                sim.as_double("embedding").alias("de"),
                F.transform(
                    sim.as_double("embedding"),
                    lambda x: F.round(x * sim._CENT_SCALE).cast("long"),
                ).alias("qe"),
            )
            .localCheckpoint(eager=True)
        )

    def p_eq():
        mk_eq()

    e_q = mk_eq()
    cents = sim._km_train(spark, e_q, k, stride)

    def p_train():
        sim._km_train(spark, e_q, k, stride)

    def p_assign():
        sim._km_assign_arrow(e_q, cents).write.format("noop").mode("overwrite").save()

    def mk_base():
        assign = sim._km_assign_arrow(e_q, cents)
        cd = F.transform("cq", lambda q: q.cast("double") / sim._CENT_SCALE)
        return (
            assign.alias("a")
            .join(e_q.alias("v"), F.col("a.vec_id") == F.col("v.vec_id"))
            .join(F.broadcast(cents.select("cell", cd.alias("cd"))), "cell")
            .select(
                F.col("a.vec_id").alias("vec_id"),
                "cell",
                F.col("v.de").alias("de"),
                F.round(sim.cosine(F.col("v.de"), F.col("cd")), 6).alias("cs_cent"),
            )
            .localCheckpoint(eager=True)
        )

    def p_base():
        mk_base()

    base = mk_base()

    def p_pairs():
        sim._sd_pairs_arrow(base).write.format("noop").mode("overwrite").save()

    def p_full():
        queries["dedup_semdedup_cells"](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()

    for nm, fn in (
        ("q37 p_eq_pin", p_eq),
        ("q37 p_train", p_train),
        ("q37 p_assign", p_assign),
        ("q37 p_base_pin", p_base),
        ("q37 p_pairs", p_pairs),
        ("q37 p_full", p_full),
    ):
        profile(nm, fn, spark)
    release_pins(spark)

    # ---------- q20 ----------
    docs = load(spark, SF, "documents")

    def mk_dt():
        d = dd._parallel(spark, docs).select(
            "doc_id", "source", F.explode(dd.distinct_tokens("text")).alias("term")
        )
        nd = d.agg(F.count_distinct("doc_id").alias("nd"))
        idf = (
            d.groupBy("term")
            .agg(F.count_distinct("doc_id").alias("df"))
            .crossJoin(F.broadcast(nd))
            .select(
                "term",
                "df",
                "nd",
                F.round(
                    F.log(F.col("nd").cast("double") / F.col("df")) * 1_000_000_000
                )
                .cast("long")
                .alias("w"),
            )
        )
        kept = idf.filter(
            (F.col("df") <= dd._WJAC_DF_MIN)
            | (F.col("df") * dd._WJAC_DF_DEN <= F.col("nd"))
        ).select("term", "w")
        from dataflow_pubsub_message_encryption_spark.materialize import pin

        return pin(d.join(kept, "term"))

    def p_dtpin():
        mk_dt()

    dt = mk_dt()

    def p_sums():
        dt.groupBy("doc_id").agg(F.sum("w").alias("sw")).write.format("noop").mode(
            "overwrite"
        ).save()

    def p_inter():
        a, b = dt.alias("a"), dt.alias("b")
        (
            a.join(
                b,
                (F.col("a.source") == F.col("b.source"))
                & (F.col("a.term") == F.col("b.term"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.sum(F.col("a.w")).alias("iw"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def p20_full():
        queries["dedup_weighted_jaccard"](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()

    for nm, fn in (
        ("q20 p_dt_pin", p_dtpin),
        ("q20 p_sums", p_sums),
        ("q20 p_inter", p_inter),
        ("q20 p_full", p20_full),
    ):
        profile(nm, fn, spark)
    spark.stop()


if __name__ == "__main__":
    main()
