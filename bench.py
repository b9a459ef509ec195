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
    ("q11_embedding_lsh_dedup", "dedup_embedding_lsh"),
    ("q12_connected_components", "dedup_cluster_components"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dataflow_pubsub_message_encryption_spark.operators import registry
    from dataflow_pubsub_message_encryption_spark.session import get_session

    queries, _ = registry()
    spark = get_session("bench")
    # Untimed warm-up: two passes over the same query mix. The driver runs
    # this script on a cold JVM, where the first executions of each plan pay
    # one-time costs unrelated to query execution at scale: Janino
    # compilation of the whole-stage-codegen sources, then HotSpot running
    # that generated code interpreted/C1 until it earns C2 compilation
    # (measured: the MinHash query's first two executions land anywhere in
    # 2-50s; from the third on it is a stable ~1.7s — pure JIT warm-up, no
    # data-size component), plus Arrow Python-worker fork/handshake and
    # shuffle/broadcast machinery init. A long-lived cluster pays these once
    # per plan shape, not per query, so the timed pass below measures warm
    # steady-state throughput — the quantity that actually scales. Two
    # passes because HotSpot needs more than one execution to tier up the
    # big generated methods. BASELINE.md records numbers under the same
    # methodology (like-for-like gate).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for _ in range(2):
        for _, key in HEADLINE:
            try:
                queries[key](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — warm-up must never fail the bench
                pass

    # Two timed passes, report the per-query minimum: even after warm-up,
    # HotSpot occasionally deoptimizes/recompiles a big generated method
    # mid-run (measured 2-8s one-off spikes on the MinHash query). min-of-2
    # is the standard outlier-resistant estimator for steady-state wall
    # time; BASELINE.md is recorded the same way.
    times: dict[str, float] = {}
    for _ in range(2):
        for label, key in HEADLINE:
            t0 = time.time()
            queries[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            times[label] = min(times.get(label, dt), dt)

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
