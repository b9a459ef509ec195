"""Measure per-stage shuffle volume (bytes + records) for a registry query.

VERDICT r12 item 5 asked for the generalized LSH band join's carried
width to be *measured* down, not claimed: bytes/row of the exploded-side
shuffle before vs after the prefix-slice + unhex trim. This runs ONE
registry query in a fresh session with the UI status store enabled, then
reads the stage-level ``shuffleWriteBytes`` / ``shuffleWriteRecords``
off the UI REST API (the same numbers the Spark UI's Stages tab shows)
and prints one JSON line, stages sorted by write volume.

Usage: python tools/shuffle_bytes.py <query_key> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--no-broadcast"]
    # --no-broadcast disables broadcast joins so the fixture-scale run
    # exhibits the SHUFFLE shape a 100 TB run would (at sf0.01 the whole
    # banded side fits under the broadcast threshold and the exchange
    # under measurement never materializes)
    no_broadcast = "--no-broadcast" in sys.argv[1:]
    key = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    from dataflow_pubsub_message_encryption_spark.operators import registry
    from dataflow_pubsub_message_encryption_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.master("local[8]")
        .appName(f"shuffle-bytes-{key}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")  # the status store IS the meter
        .config("spark.ui.port", "4049")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if no_broadcast:
        builder = builder.config(
            "spark.sql.autoBroadcastJoinThreshold", "-1"
        ).config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark = builder.getOrCreate()

    queries, _ = registry()
    queries[key](spark, sf_dir).write.format("noop").mode("overwrite").save()

    base = spark.sparkContext.uiWebUrl + "/api/v1/applications"
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/{app_id}/stages") as fh:
        stages = json.load(fh)

    rows = []
    for s in stages:
        if s.get("shuffleWriteBytes", 0) == 0:
            continue
        recs = s.get("shuffleWriteRecords", 0)
        rows.append(
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:60],
                "write_bytes": s["shuffleWriteBytes"],
                "write_records": recs,
                "bytes_per_row": round(s["shuffleWriteBytes"] / recs, 1)
                if recs
                else None,
            }
        )
    rows.sort(key=lambda r: -r["write_bytes"])
    print(
        json.dumps(
            {
                "key": key,
                "sf_dir": sf_dir,
                "total_shuffle_write_bytes": sum(r["write_bytes"] for r in rows),
                "stages": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
