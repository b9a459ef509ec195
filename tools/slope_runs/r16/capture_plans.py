"""Capture formatted plans for round-16 target keys.

Usage: python tools/slope_runs/r16/capture_plans.py <suffix> key [key ...]
Writes plans/r16/<key>_<suffix>.txt (explain("formatted") of the returned
DataFrame at sf0.1). Keys with eager pins execute their build jobs during
construction — expected; plans are not timing evidence.
"""

import os
import sys

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, _REPO)

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.session import get_session
from dataflow_pubsub_message_encryption_spark.materialize import release_pins

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(_REPO, "plans", "r16")

suffix = sys.argv[1]
keys = sys.argv[2:]
queries, _ = registry()
spark = get_session("capture-plans")
os.makedirs(OUT, exist_ok=True)
for k in keys:
    df = queries[k](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    with open(os.path.join(OUT, f"{k}_{suffix}.txt"), "w") as fh:
        fh.write(plan)
    release_pins(spark)
    print("captured", k)
spark.stop()
