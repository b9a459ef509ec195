"""Capture .explain('formatted') for the optimization-round target keys
into plans/r15/<key>_<tag>.txt (tag = before|after).

Usage: python tools/slope_runs/r15opt/capture_plans.py TAG [KEY...]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

tag = sys.argv[1]
keys = sys.argv[2:] or [
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_auto",
    "dedup_embedding_lsh_banded",
    "dedup_embedding_lsh_banded_auto",
    "sim_ann_graph_topk_blocked",
    "sim_ann_graph_topk_blocked_wide",
    "sim_ann_graph_topk_blocked_auto",
    "dedup_span_suffix_array",
    "dedup_span_suffix_doubling",
    "dedup_semdedup_cells",
    "decontam_embedding_cosine",
]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.plans import formatted_plan
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import release_pins

queries, _ = registry()
spark = get_session("capture-plans")
os.makedirs("/root/repo/plans/r15", exist_ok=True)
for k in keys:
    plan = formatted_plan(queries[k](spark, sf_dir))
    with open(f"/root/repo/plans/r15/{k}_{tag}.txt", "w") as f:
        f.write(plan)
    release_pins(spark)
    print(f"captured {k} ({len(plan)} chars)")
