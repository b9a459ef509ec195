"""One-off measurement for VERDICT r14 item 1: shuffle volume of the
ids-only re-join-vectors-by-id embedding-LSH variant vs the carry design
(`_emb_lsh_pairs_body`). Run:  python tools/slope_runs/r14/measure_rejoin.py
Prints one JSON line per variant (stage shuffle write bytes/records).
"""

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from dataflow_pubsub_message_encryption_spark.functions.vectors import (  # noqa: E402
    as_double,
    dot,
    norm,
)
from dataflow_pubsub_message_encryption_spark.operators.similarity import (  # noqa: E402
    _BLOCK_BITS,
    _DEDUP_TAU,
    _bucket_bits,
    _emb_lsh_pairs_body,
)
from dataflow_pubsub_message_encryption_spark.session import RUNTIME_CONFS  # noqa: E402
from dataflow_pubsub_message_encryption_spark.sources import load  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def rejoin_body(spark, sf_dir, bits):
    """ids-only candidate shuffle + verify-stage vector re-join by id —
    the shape VERDICT r13 item 1 asked to evaluate."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double("embedding").alias("emb"))
    b = e.select(
        "vec_id",
        norm(as_double("embedding")).alias("nrm"),
        _bucket_bits(as_double("embedding"), bits).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    cand = x.join(
        y,
        (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col("x.vec_id") < F.col("y.vec_id")),
    ).select(
        F.col("x.vec_id").alias("vec_a"),
        F.col("y.vec_id").alias("vec_b"),
        F.col("x.bucket").alias("bucket"),
        (F.col("x.nrm") * F.col("y.nrm")).alias("nn"),
    )
    va, vb = v.alias("va"), v.alias("vb")
    pairs = cand.join(va, F.col("vec_a") == F.col("va.vec_id")).join(
        vb, F.col("vec_b") == F.col("vb.vec_id")
    )
    cs = F.round(dot(F.col("va.emb"), F.col("vb.emb")) / F.col("nn"), 6)
    return pairs.select(
        "vec_a", "vec_b", "bucket", cs.alias("cos_sim")
    ).filter(F.col("cos_sim") >= _DEDUP_TAU)


def measure(name, fn):
    builder = (
        SparkSession.builder.master("local[8]")
        .appName(f"rejoin-measure-{name}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    )
    for k, vv in RUNTIME_CONFS.items():
        builder = builder.config(k, vv)
    spark = builder.getOrCreate()
    df = fn(spark, SF_DIR, _BLOCK_BITS)
    n_out = df.count()
    df.write.format("noop").mode("overwrite").save()
    base = spark.sparkContext.uiWebUrl + "/api/v1/applications"
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/{app_id}/stages") as fh:
        stages = json.load(fh)
    rows = [
        {
            "stage": s["stageId"],
            "write_bytes": s["shuffleWriteBytes"],
            "write_records": s.get("shuffleWriteRecords", 0),
        }
        for s in stages
        if s.get("shuffleWriteBytes", 0) > 0
    ]
    rows.sort(key=lambda r: -r["write_bytes"])
    # n_cand: size of the bucket self-join output (pre-verify)
    e = load(spark, SF_DIR, "embeddings")
    bk = e.select(
        "vec_id", _bucket_bits(as_double("embedding"), _BLOCK_BITS).alias("bucket")
    )
    n_cand = (
        bk.alias("x")
        .join(
            bk.alias("y"),
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .count()
    )
    print(
        json.dumps(
            {
                "variant": name,
                "n_out": n_out,
                "n_candidates": n_cand,
                "total_shuffle_write_bytes": sum(r["write_bytes"] for r in rows),
                "stages": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("rejoin", "both"):
        measure("rejoin", rejoin_body)
    if which in ("carry", "both"):
        measure("carry", _emb_lsh_pairs_body)
