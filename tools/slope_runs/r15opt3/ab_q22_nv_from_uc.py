"""A/B: text_heldout_perplexity — derive the (n, v) scalars from the
unigram count table instead of a second full tokenize pass.

OLD (shipped): nv = trtok.agg(count(*), count_distinct(term)) — a second
scan + explode + global aggregate over the training folds' tokens.
NEW: nv = uc.agg(sum(ucnt) AS n, count(*) AS v) — algebraically identical
(count over tokens == sum of per-term counts; distinct terms == uc row
count) and shares uc's per-term aggregation exchange, removing one full
tokenize pass from the plan (guide §2.4: fewer shuffles/scans).

Protocol: outputs proven row-identical at sf0.001/sf0.01/sf0.1 FIRST,
then interleaved 5-rep timing (2 untimed warm) at sf0.1 single-file and
the 32-file multifile twin.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.operators.text import load, tokens
from dataflow_pubsub_message_encryption_spark.operators.sampling import _KFOLD
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import release_pins

queries, _ = registry()
OLD = queries["text_heldout_perplexity"]


def NEW(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    nib = lambda i: (  # noqa: E731
        F.instr(
            F.lit("0123456789abcdef"), F.substring(F.sha2("text", 256), i, 1)
        )
        - 1
    )
    fold = ((nib(1) * 16 + nib(2)) % _KFOLD).cast("int")
    d = docs.select("doc_id", "text", fold.alias("fold"))
    tr = d.filter(F.col("fold") != 0)
    ho = d.filter(F.col("fold") == 0)
    trtok = tr.select(F.explode(tokens("text")).alias("term"))
    uc = trtok.groupBy("term").agg(F.count("*").alias("ucnt"))
    # THE CHANGE: n == sum of per-term counts, v == number of terms.
    nv = uc.agg(
        F.sum("ucnt").alias("n"), F.count("*").alias("v")
    )

    def bigrams(frame, with_doc):
        cols = (["doc_id"] if with_doc else []) + ["pq.p", "pq.q"]
        return (
            frame.select(
                *([F.col("doc_id")] if with_doc else []),
                tokens("text").alias("t"),
            )
            .filter(F.size("t") >= 2)
            .select(
                *([F.col("doc_id")] if with_doc else []),
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(t) - 2),"
                        " i -> struct(t[i] AS p, t[i + 1] AS q))"
                    )
                ).alias("pq"),
            )
            .select(*cols)
        )

    bc = bigrams(tr, False).groupBy("p", "q").agg(F.count("*").alias("bcnt"))
    lm = bc.groupBy("p").agg(F.sum("bcnt").alias("lcnt"))
    hp = (
        bigrams(ho, True)
        .groupBy("doc_id", "p", "q")
        .agg(F.count("*").alias("c"))
    )
    j = (
        hp.join(F.broadcast(bc), ["p", "q"], "left")
        .join(F.broadcast(lm), "p", "left")
        .join(F.broadcast(uc), hp.q == uc.term, "left")
        .crossJoin(F.broadcast(nv))
    )
    bcnt = F.coalesce(F.col("bcnt"), F.lit(0))
    lcnt = F.coalesce(F.col("lcnt"), F.lit(0))
    ucnt = F.coalesce(F.col("ucnt"), F.lit(0))
    nv1 = F.col("n") + F.col("v") + 1
    seen_lp = F.round(
        F.log(
            (F.lit(7) * bcnt * nv1 + F.lit(3) * (ucnt + 1) * lcnt).cast(
                "double"
            )
            / (F.lit(10) * lcnt * nv1).cast("double")
        )
        * 1_000_000_000
    ).cast("long")
    oov_lp = F.round(
        F.log((ucnt + 1).cast("double") / nv1.cast("double")) * 1_000_000_000
    ).cast("long")
    lp = F.when(lcnt > 0, seen_lp).otherwise(oov_lp)
    unseen = F.when(bcnt == 0, F.col("c")).otherwise(F.lit(0))
    return (
        j.select("doc_id", "c", unseen.alias("unseen"), lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum("unseen").cast("long").alias("n_unseen_bigrams"),
            F.round(
                -(F.sum(F.col("c") * F.col("lp")).cast("double")
                  / 1_000_000_000)
                / F.sum("c"),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


if __name__ == "__main__":
    spark = get_session("ab-q22-nv-from-uc")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        a = sorted(map(tuple, OLD(spark, sf).collect()))
        b = sorted(map(tuple, NEW(spark, sf).collect()))
        print(f"{sf} outputs equal: {a == b} ({len(a)} rows)", flush=True)
        assert a == b
        release_pins(spark)

    # Static-plan scan census for the record.
    import contextlib
    import io

    for tag, fn in (("old", OLD), ("new", NEW)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, "/root/testdata/sf0.1").explain("formatted")
        plan = buf.getvalue()
        scans = plan.count("Scan parquet")
        reuse = plan.count("ReusedExchange")
        print(f"{tag}: {scans} parquet scans, {reuse} ReusedExchange", flush=True)

    def timed(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        release_pins(spark)
        return time.time() - t0

    for sf in ("/root/testdata/sf0.1", "/root/repo/spark-warehouse/sf0.1-multifile"):
        for _ in range(2):
            timed(OLD, sf); timed(NEW, sf)
        olds, news = [], []
        for _ in range(5):
            olds.append(timed(OLD, sf))
            news.append(timed(NEW, sf))
        print(f"{sf}\n  old {['%.2f' % t for t in olds]} med {statistics.median(olds):.2f} min {min(olds):.2f}"
              f"\n  new {['%.2f' % t for t in news]} med {statistics.median(news):.2f} min {min(news):.2f}",
              flush=True)
