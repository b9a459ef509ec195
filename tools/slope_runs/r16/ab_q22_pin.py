"""q22 heldout perplexity: pin the uc/bc count tables — VERDICT r15
item 6 (the deferred quiet-box A/B on BOTH layouts).

The r15-rejected variant pinned the fold-tagged DOCS table (text column
materialized) plus the count tables and lost single-file (2.08 -> 2.90).
This variant pins ONLY the two doubly-consumed count tables:

  uc (term, ucnt)  — consumed by the broadcast scoring join AND nv
  bc (p, q, bcnt)  — consumed by the broadcast scoring join AND lm

Each pin turns two tokenize-explode-aggregate passes into one pass plus
one narrow materialization; hp (single consumer) stays unpinned.

Equality at 3 SFs, then interleaved A/B on single-file sf0.1 and the
32-file multifile twin.
"""

import os
import sys
import time

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.materialize import pin, release_pins
from dataflow_pubsub_message_encryption_spark.operators.text import (
    QUERIES as TEXT_QUERIES,
)
from dataflow_pubsub_message_encryption_spark.functions.textfns import tokens
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.sources import load

REPS = int(os.environ.get("REPS", "5"))


def new_body(spark, sf_dir):
    from dataflow_pubsub_message_encryption_spark.operators.sampling import _KFOLD

    docs = load(spark, sf_dir, "documents")
    nib = lambda i: (  # noqa: E731
        F.instr(F.lit("0123456789abcdef"), F.substring(F.sha2("text", 256), i, 1)) - 1
    )
    fold = ((nib(1) * 16 + nib(2)) % _KFOLD).cast("int")
    d = docs.select("doc_id", "text", fold.alias("fold"))
    tr = d.filter(F.col("fold") != 0)
    ho = d.filter(F.col("fold") == 0)
    trtok = tr.select(F.explode(tokens("text")).alias("term"))
    uc = pin(trtok.groupBy("term").agg(F.count("*").alias("ucnt")))
    nv = uc.agg(F.sum("ucnt").alias("n"), F.count("*").alias("v"))

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

    bc = pin(bigrams(tr, False).groupBy("p", "q").agg(F.count("*").alias("bcnt")))
    lm = bc.groupBy("p").agg(F.sum("bcnt").alias("lcnt"))
    hp = bigrams(ho, True).groupBy("doc_id", "p", "q").agg(F.count("*").alias("c"))
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
            (F.lit(7) * bcnt * nv1 + F.lit(3) * (ucnt + 1) * lcnt).cast("double")
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
                -(F.sum(F.col("c") * F.col("lp")).cast("double") / 1_000_000_000)
                / F.sum("c"),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


def canon(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def main():
    old_body = TEXT_QUERIES["text_heldout_perplexity"]
    spark = get_session("ab-q22")
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        a = canon(old_body(spark, sf))
        release_pins(spark)
        b = canon(new_body(spark, sf))
        release_pins(spark)
        assert a == b, f"mismatch at {sf}"
        print(f"equal at {sf}: {len(a)} rows", flush=True)

    def run(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_pins(spark)
        return dt

    for sf in ("/root/testdata/sf0.1", os.path.join(_REPO, "spark-warehouse", "sf0.1-multifile")):
        for _ in range(2):
            run(old_body, sf)
            run(new_body, sf)
        old, new = [], []
        for _ in range(REPS):
            old.append(run(old_body, sf))
            new.append(run(new_body, sf))
        print(
            f"layout {os.path.basename(sf)}: old med {sorted(old)[len(old)//2]:.3f} min {min(old):.3f} {[round(t,3) for t in old]} | "
            f"new med {sorted(new)[len(new)//2]:.3f} min {min(new):.3f} {[round(t,3) for t in new]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
