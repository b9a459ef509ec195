"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's DoFn model allows arbitrary per-key state in the worker
[U/H: Beam stateful DoFn]; Structured Streaming's equivalent escape hatch
is ``applyInPandasWithState`` — per-group Arrow batches plus a versioned,
checkpointed ``GroupState``. The example operator keeps a running per-user
census (event count, value sum, last-seen timestamp) across micro-batches:
the canonical "user profile accumulator" of a streaming training-data
pipeline.

Scale notes: state lives in the state store (RocksDB provider for large
key spaces), partitioned by the group key; a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) would bound state for
abandoned keys — omitted here so replays stay deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE, last_ts TIMESTAMP"
STATE_SCHEMA = "n_events LONG, total_value DOUBLE, last_ts TIMESTAMP"


def _update_user_census(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None else max(last, batch_max)
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last],
        }
    )


def running_user_census(events: DataFrame) -> DataFrame:
    """Per-user running aggregates maintained as explicit GroupState —
    update-mode output emits the refreshed census row for every user seen
    in the micro-batch."""
    return (
        events.select("user_id", "value", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_census,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
