"""Benchmark: headline queries at sf0.1 (driver contract: one JSON line).

Runs the representative query mix — reference pipeline, heavy relational,
and LLM-pipeline operators — with AQE on, and reports per-query wall time.
Each query materializes fully through the noop sink (no driver collect, no
sink I/O in the measurement).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    ("q1_tpch_q1_agg", "agg_hash_groupby"),
    ("q2_orders_lineitem_join", "join_sortmerge"),
    ("q3_topk_per_customer", "win_rank_topk"),
    ("q4_encrypted_pipeline", "pipeline_end_to_end"),
    ("q5_tumbling_windows", "window_tumbling_counts"),
    ("q6_asof_join", "join_asof"),
    ("q7_cosine_topk", "sim_cosine_topk"),
    ("q8_minhash_lsh_dedup", "dedup_minhash_lsh_pairs"),
    ("q9_near_dup_jaccard", "dedup_near_jaccard"),
    ("q10_tokenize_topterms", "text_tokenize_topterms"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dataflow_pubsub_message_encryption_spark.operators import registry
    from dataflow_pubsub_message_encryption_spark.session import get_session

    queries, _ = registry()
    spark = get_session("bench")
    # warm the JVM + parquet footers so q1 doesn't pay session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for label, key in HEADLINE:
        t0 = time.time()
        queries[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[label] = round(time.time() - t0, 3)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    print(
        json.dumps(
            {
                "metric": "headline query wall time, sum over mix",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
