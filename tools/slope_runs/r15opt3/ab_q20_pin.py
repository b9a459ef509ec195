"""A/B: dedup_weighted_jaccard — pin the token-grain tables the body
instantiates repeatedly.

OLD (shipped): the distinct-token stream `d` is instantiated ~5× (nd
census, idf groupBy, and dt -> sums + both self-join sides), each a full
scan + tokenize; the audited plan reads 12 documents scans.

P1: pin dt (the df-capped stream; 3 uses -> 1 compute + narrow pin).
P2: pin d itself (every downstream reads the pin; 5 computes -> 1 +
pin write), dt additionally pinned off it is NOT done — kept lazy so
the cap join stays one hop off the pin.

Equality is structural (pin is an identity), but collect-compare at all
three SFs anyway per house protocol; then interleaved 7-rep timing on
both layouts.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators.dedup import (
    _WJAC_DF_DEN,
    _WJAC_DF_MIN,
    _WJAC_TAU,
    _parallel,
    distinct_tokens,
    load,
)
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import pin, release_pins

queries, _ = registry()
OLD = queries["dedup_weighted_jaccard"]


def _wjac(spark, docs, pin_d, pin_dt):
    d = _parallel(spark, docs).select(
        "doc_id", "source", F.explode(distinct_tokens("text")).alias("term")
    )
    if pin_d:
        d = pin(d)
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
                F.log(F.col("nd").cast("double") / F.col("df"))
                * 1_000_000_000
            )
            .cast("long")
            .alias("w"),
        )
    )
    kept = idf.filter(
        (F.col("df") <= _WJAC_DF_MIN)
        | (F.col("df") * _WJAC_DF_DEN <= F.col("nd"))
    ).select("term", "w")
    dt = d.join(kept, "term")
    if pin_dt:
        dt = pin(dt)
    sums = dt.groupBy("doc_id").agg(F.sum("w").alias("sw"))
    a, b = dt.alias("a"), dt.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.sum(F.col("a.w")).alias("iw"))
    )
    sa = sums.select(F.col("doc_id").alias("doc_a"), F.col("sw").alias("swa"))
    sb = sums.select(F.col("doc_id").alias("doc_b"), F.col("sw").alias("swb"))
    wj = F.col("iw").cast("double") / (
        F.col("swa") + F.col("swb") - F.col("iw")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(wj >= _WJAC_TAU)
        .select("doc_a", "doc_b", F.round(wj, 6).alias("wjac"))
    )


def P1(spark, sf_dir):
    return _wjac(spark, load(spark, sf_dir, "documents"), False, True)


def P2(spark, sf_dir):
    return _wjac(spark, load(spark, sf_dir, "documents"), True, False)


if __name__ == "__main__":
    spark = get_session("ab-q20-pin")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        ref = sorted(map(tuple, OLD(spark, sf).collect()))
        release_pins(spark)
        for tag, fn in (("p1", P1), ("p2", P2)):
            got = sorted(map(tuple, fn(spark, sf).collect()))
            release_pins(spark)
            print(f"{sf} {tag} equal: {got == ref} ({len(ref)} rows)",
                  flush=True)
            assert got == ref

    def timed(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        release_pins(spark)
        return time.time() - t0

    for sf in ("/root/testdata/sf0.1",
               "/root/repo/spark-warehouse/sf0.1-multifile"):
        variants = [("old", OLD), ("p1", P1), ("p2", P2)]
        for _ in range(2):
            for _, fn in variants:
                timed(fn, sf)
        samples = {t: [] for t, _ in variants}
        for _ in range(7):
            for t, fn in variants:
                samples[t].append(timed(fn, sf))
        print(sf, flush=True)
        for t, _ in variants:
            v = samples[t]
            print(f"  {t} {['%.2f' % x for x in v]} med "
                  f"{statistics.median(v):.2f} min {min(v):.2f}", flush=True)
