"""A/B: DSIR weights DAG — fuse the three token-grain census aggregates
into one pass, and (variant 2) pin the narrow integer weights table in
the mix-shift ACTION so the data-dependent threshold's two-pass cost
stops re-running the whole weights DAG.

OLD (shipped, `_dsir_weights`): the token-grain bucketed stream `bk` is
instantiated FOUR times — raw census (groupBy b), target census
(filter + groupBy b), corpus totals (global count/count_if), and the
per-doc bucket counts `db`. Each instantiation is a full scan + tokenize
+ explode of the corpus (22 parquet scans in q31's plan: the DAG runs
twice for the data-dependent above-mean threshold).

NEW1: one `per = bk.groupBy(b).agg(count(*) AS nr, count_if(is_target)
AS nt)` replaces raw+tgt (count_if(0) == the left-join coalesce), and
`tot` derives from per's integer sums (order-insensitive exact integer
arithmetic: tr == sum(nr), tt == sum(nt)) — 4 token-grain passes -> 2
per weights instantiation. lr is bit-identical: same exact integer
inputs to the same float expression.

NEW2 (mix-shift only): NEW1 + pin(wint) — the threshold's second pass
reads the materialized ~16 B/row integer table instead of re-running
the weights DAG (2 instantiations -> 1 + a narrow pin).

Equality: collect-compare at sf0.001/sf0.01/sf0.1 for BOTH consumers
(mix_shift, importance_topk) before any timing.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators.curation import (
    _DSIR_BUCKETS,
    _DSIR_TARGET_SRC,
    load,
    tokens,
)
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import pin, release_pins

queries, _ = registry()
OLD_MIX = queries["corpus_dsir_resample_mix_shift"]
OLD_TOPK = queries["corpus_dsir_importance_topk"]


def _weights_new(spark, sf_dir, target):
    is_target = F.lit(True) if target == "*" else F.col("source") == target
    docs = load(spark, sf_dir, "documents")
    bk = docs.select(
        "doc_id",
        "source",
        F.explode(tokens("text")).alias("t"),
    ).select(
        "doc_id", "source", F.substring(F.sha2(F.col("t"), 256), 1, 2).alias("b")
    )
    per = bk.groupBy("b").agg(
        F.count("*").alias("nr"), F.count_if(is_target).alias("nt")
    )
    tot = per.agg(F.sum("nr").alias("tr"), F.sum("nt").alias("tt"))
    nb = F.lit(float(_DSIR_BUCKETS))
    lr = per.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("nt") + 1) / (F.col("tt") + nb))
            - F.log((F.col("nr") + 1) / (F.col("tr") + nb))
        ).alias("lr"),
    )
    db = bk.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    w = (
        db.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("dsir_logweight"))
    )
    return w.join(docs.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", "dsir_logweight"
    )


def NEW_TOPK(spark, sf_dir):
    return (
        _weights_new(spark, sf_dir, _DSIR_TARGET_SRC)
        .orderBy(F.desc("dsir_logweight"), "doc_id")
        .limit(100)
    )


def _mix_shift(spark, sf_dir, weights_fn, use_pin):
    w = weights_fn(spark, sf_dir, _DSIR_TARGET_SRC)
    docs = load(spark, sf_dir, "documents")
    wint = w.select(
        "source",
        F.round(F.col("dsir_logweight") * 1000000, 0).cast("long").alias("wi"),
    )
    if use_pin:
        wint = pin(wint)
    thr = wint.agg(F.count("*").alias("na"), F.sum("wi").alias("s"))
    sel = (
        wint.crossJoin(F.broadcast(thr))
        .filter(
            F.col("wi").cast("decimal(19,0)") * F.col("na").cast("decimal(19,0)")
            > F.col("s").cast("decimal(38,0)")
        )
        .select("source")
    )
    base = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    selc = sel.groupBy("source").agg(F.count("*").alias("n_selected"))
    n_sel = selc.agg(
        F.coalesce(F.sum("n_selected"), F.lit(0)).cast("long").alias("ns")
    )
    n_all = base.agg(F.sum("n_docs").cast("long").alias("na"))
    return (
        base.join(selc, "source", "left")
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(n_sel))
        .select(
            "source",
            "n_docs",
            F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
            F.expr("CAST(n_docs * 1000000 DIV na AS BIGINT)").alias(
                "share_before_ppm"
            ),
            F.expr(
                "CAST(CASE WHEN ns = 0 THEN 0 "
                "ELSE coalesce(n_selected, 0) * 1000000 DIV ns END AS BIGINT)"
            ).alias("share_after_ppm"),
            F.expr(
                "CAST(coalesce(n_selected, 0) * 1000000 DIV n_docs AS BIGINT)"
            ).alias("keep_rate_ppm"),
        )
        .orderBy("source")
    )


def NEW1_MIX(spark, sf_dir):
    return _mix_shift(spark, sf_dir, _weights_new, use_pin=False)


def NEW2_MIX(spark, sf_dir):
    return _mix_shift(spark, sf_dir, _weights_new, use_pin=True)


if __name__ == "__main__":
    spark = get_session("ab-dsir-fused")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        ref_mix = sorted(map(tuple, OLD_MIX(spark, sf).collect()))
        ref_topk = list(map(tuple, OLD_TOPK(spark, sf).collect()))
        for tag, fn, ordered in (
            ("topk-new", NEW_TOPK, True),
            ("mix-new1", NEW1_MIX, False),
            ("mix-new2", NEW2_MIX, False),
        ):
            got = list(map(tuple, fn(spark, sf).collect()))
            ref = ref_topk if ordered else ref_mix
            if not ordered:
                got = sorted(got)
            print(f"{sf} {tag} equal: {got == ref} ({len(ref)} rows)",
                  flush=True)
            assert got == ref
            release_pins(spark)

    import contextlib
    import io

    for tag, fn in (("mix-old", OLD_MIX), ("mix-new1", NEW1_MIX),
                    ("mix-new2", NEW2_MIX), ("topk-old", OLD_TOPK),
                    ("topk-new", NEW_TOPK)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, "/root/testdata/sf0.1").explain("formatted")
        plan = buf.getvalue()
        print(f"{tag}: {plan.count('Scan parquet')} parquet scans, "
              f"{plan.count('ReusedExchange')} ReusedExchange", flush=True)

    def timed(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        release_pins(spark)
        return time.time() - t0

    for sf in ("/root/testdata/sf0.1",
               "/root/repo/spark-warehouse/sf0.1-multifile"):
        variants = [("mix-old", OLD_MIX), ("mix-new1", NEW1_MIX),
                    ("mix-new2", NEW2_MIX), ("topk-old", OLD_TOPK),
                    ("topk-new", NEW_TOPK)]
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
