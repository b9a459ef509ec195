"""Streaming soak: sustained envelope-decrypt throughput from the rate
source — the apples-to-apples number against the reference's streaming
pipeline (whose motivation was that per-message KMS RPCs cap throughput;
here the cached unwrap makes decrypt compute-bound).

Usage: python tools/soak.py [seconds] [rows_per_second]
Prints one JSON line with rows processed and sustained events/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rps = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    from pyspark.sql import functions as F

    from dataflow_pubsub_message_encryption_spark import streaming as st
    from dataflow_pubsub_message_encryption_spark.session import get_session

    spark = get_session("soak")
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rps))
        .option("numPartitions", "32")
        .load()
    )
    events = rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 1000).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.concat(F.lit('{"k": '), (F.col("value") % 100), F.lit("}")).alias("props"),
    )
    # full pipeline: envelope synth + cached unwrap + AES decrypt + MAC verify
    dec = st.decrypted_stream(events)

    q = dec.writeStream.format("noop").start()
    t0 = time.time()
    seen: dict[int, int] = {}
    while time.time() - t0 < seconds:
        time.sleep(1)
        p = q.lastProgress
        if p is not None:
            seen[p["batchId"]] = p["numInputRows"]
    q.stop()
    q.awaitTermination(60)
    elapsed = time.time() - t0
    total = sum(seen.values())
    print(
        json.dumps(
            {
                "metric": "sustained envelope-decrypt stream throughput",
                "events_processed": total,
                "seconds": round(elapsed, 1),
                "events_per_sec": round(total / elapsed),
                "offered_rows_per_sec": rps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
