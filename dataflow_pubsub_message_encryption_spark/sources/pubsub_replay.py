"""Custom Python streaming DataSource (Spark 4 ``pyspark.sql.datasource``)
— the Pub/Sub-shaped replay source (VERDICT r8 item 5).

The reference's input [U/H] is an unbounded Pub/Sub subscription:
messages with an opaque ``data: bytes`` payload, an ``attributes``
string map, a message id, and a publish time, delivered AT-LEAST-ONCE.
The streaming tests so far stood that in with file-stream/rate sources,
which cannot express the attributes map or redelivery. This source
closes that fidelity gap with the real Spark-4 extension API:

- **Schema**: ``event_id BIGINT, value BINARY, attrs
  MAP<STRING,STRING>, publish_ts TIMESTAMP`` — the Kafka-source shape
  the engine's data model (SURVEY §1) standardizes on.
- **Offsets**: one planned entry per topic segment (parquet file of the
  events fixture, sorted), journaled by Spark's checkpoint exactly like
  any V2 source. ``latestOffset`` reports the full plan head — STATELESS
  on purpose: the reader instance is rebuilt on restart and the API
  gives it no view of the committed offset, so any instance-local
  pacing counter would restart at zero and re-plan already-committed
  ranges (double-delivery beyond the deliberate knob) or starve an
  availableNow drain. Batch pacing belongs to the engine's ReadLimits /
  trigger, not to a counter the checkpoint cannot see.
- **At-least-once**: ``redeliver_first=true`` re-plans segment 0 as a
  SECOND delivery (its own planned entry, tagged delivery=2) — the
  Pub/Sub redelivery case — so consumer-side dedup
  (``dropDuplicatesWithinWatermark`` / R11) is what establishes
  effectively-once, exactly as the reference relies on [U/H]. The
  duplicate is bit-identical payload + attrs.
- **Executor-side reads**: ``partitions()`` ships (segment, path)
  partitions; ``read()`` runs in the Python worker and reads its file
  with pyarrow — the driver never touches row data (the 100 TB
  contract; a real subscription source would pull its assigned
  bundle the same way).

``commit(end)`` is a no-op: segments are durable files; a broker-backed
source would ack up to ``end`` here.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "event_id BIGINT, value BINARY, attrs MAP<STRING,STRING>, "
    "publish_ts TIMESTAMP"
)


class _Segment(InputPartition):
    def __init__(self, seq: int, path: str, delivery: int) -> None:
        self.seq = seq
        self.path = path
        self.delivery = delivery  # 1 = first delivery, 2 = redelivery


class PubsubReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("pubsub_replay requires option 'path'")
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no parquet segments under {path}")
        redeliver = str(options.get("redeliver_first", "false")).lower() == "true"
        # the delivery plan: every segment once, in order; with the
        # at-least-once knob, segment 0 is delivered AGAIN as its own
        # later planned entry (cross-micro-batch redelivery)
        self._plan = [(f, 1) for f in files]
        if redeliver:
            self._plan.append((files[0], 2))

    def initialOffset(self) -> dict:
        return {"entry": 0}

    def latestOffset(self) -> dict:
        # STATELESS head report (see module docstring): a fresh reader
        # after a checkpoint restart must never report an offset behind
        # the committed one, and the only restart-safe monotone value an
        # instance with no checkpoint view can produce is the plan head
        return {"entry": len(self._plan)}

    def partitions(self, start: dict, end: dict):
        return [
            _Segment(i, self._plan[i][0], self._plan[i][1])
            for i in range(start["entry"], end["entry"])
        ]

    def read(self, partition: _Segment):
        # executor-side: read ONLY this partition's segment
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            partition.path,
            columns=["event_id", "ts", "user_id", "event_type", "props"],
        )
        ids = tbl["event_id"].to_pylist()
        ts = tbl["ts"].to_pandas()  # ns timestamps -> pandas datetime64
        users = tbl["user_id"].to_pylist()
        types = tbl["event_type"].to_pylist()
        props = tbl["props"].to_pylist()
        for i in range(tbl.num_rows):
            yield (
                ids[i],
                (props[i] or "").encode("utf-8"),
                {
                    "event_type": types[i],
                    "user_id": str(users[i]),
                    "delivery": str(partition.delivery),
                },
                ts.iloc[i].to_pydatetime(),
            )

    def commit(self, end: dict) -> None:
        pass  # durable segments; a broker source would ack here


class PubsubReplayDataSource(DataSource):
    """``spark.dataSource.register(PubsubReplayDataSource)`` then
    ``spark.readStream.format("pubsub_replay").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "pubsub_replay"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> PubsubReplayStreamReader:
        return PubsubReplayStreamReader(self.options)
