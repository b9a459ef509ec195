"""Streaming soak: sustained envelope-decrypt throughput from the rate
source — the apples-to-apples number against the reference's streaming
pipeline (whose motivation was that per-message KMS RPCs cap throughput;
here the cached unwrap makes decrypt compute-bound).

Usage: python tools/soak.py [seconds] [rows_per_second]
       python tools/soak.py --topic TOPIC_DIR [seconds]
Prints one JSON line with rows processed and sustained events/sec.

``--topic`` consumes a topic written by tools/publish.py (the reference's
publisher/pipeline split): Kafka-wire layout in, headers -> cached unwrap ->
AES decrypt -> MAC verify in flight — no in-flight envelope synthesis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    topic_dir = None
    if args and args[0] == "--topic":
        topic_dir = args[1]
        args = args[2:]
    seconds = int(args[0]) if args else 30
    rps = int(args[1]) if len(args) > 1 else 200_000
    from pyspark.sql import functions as F

    from dataflow_pubsub_message_encryption_spark import streaming as st
    from dataflow_pubsub_message_encryption_spark.session import get_session

    spark = get_session("soak")
    if topic_dir is not None:
        from dataflow_pubsub_message_encryption_spark.sources import wire

        stream = wire.read_topic_stream(spark, topic_dir, max_files_per_trigger=4)
        dec = wire.decode_wire(stream)
        # bounded replay: drain the whole topic and measure wall time
        q = dec.writeStream.format("noop").trigger(availableNow=True).start()
        t0 = time.time()
        q.awaitTermination(600)
        elapsed = time.time() - t0
        total = sum(p["numInputRows"] for p in q.recentProgress)
        print(
            json.dumps(
                {
                    "metric": "published-topic drain: decrypt+verify throughput",
                    "events_processed": total,
                    "seconds": round(elapsed, 1),
                    "events_per_sec": round(total / elapsed),
                    "topic": topic_dir,
                }
            )
        )
        spark.stop()
        return
    else:
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
            F.concat(F.lit('{"k": '), (F.col("value") % 100), F.lit("}")).alias(
                "props"
            ),
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
