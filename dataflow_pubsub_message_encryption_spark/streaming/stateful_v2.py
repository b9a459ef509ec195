"""Spark 4 ``transformWithStateInPandas`` operator (the successor API to
``applyInPandasWithState``): versioned, schema-declared per-key state with
a processor-object lifecycle (init / handleInputRows / close), timers, and
TTL support.

The example operator keeps a per-user running TOP-3 purchase leaderboard
across micro-batches — bounded per-key state (exactly 3 doubles + a
counter) that a plain windowed aggregation cannot maintain incrementally
without re-scanning, and the minimal shape of the "per-entity incremental
ranking" family (fraud velocity tiers, best-score tracking). Update-mode
output re-emits a user's refreshed leaderboard whenever a micro-batch
touches the user; ``n_seen`` rises monotonically so a consumer (and the
stream≡batch test) can identify the final state without ordering
guarantees.

Scale notes: state lives in the state store keyed by user (RocksDB
provider for big key spaces); the per-key payload is constant-size, so
total state ∝ distinct users, independent of stream length. TTL
(``ttlDurationMs``) would bound abandoned keys — omitted so replays stay
deterministic.

ENVIRONMENT BOUNDARY (unblocked round 7): executing this API needs the
``protobuf`` package (Spark's transform-with-state Python workers speak
a protobuf state protocol), which is not pip-installed in this
container. Since round 7, ``streaming/_pb_vendor.ensure_protobuf()``
bootstraps the image's vendored pure-python protobuf runtime (Google
Cloud SDK App Engine platform, 6.32.0) into the driver AND — via the
``_worker_boot`` sitecustomize hook on the worker PYTHONPATH — into the
forked Python workers, proving it with a StateMessage round-trip first.
The end-to-end stream≡batch test runs for real under that bootstrap and
skips only when no usable runtime exists at all; the processor logic is
additionally unit-tested against a fake handle. Note the API also
requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``RocksDBStateStoreProvider``): each state variable lives in its own
column family, which the HDFS-backed default provider rejects outright
(probed 4.1.2: UNSUPPORTED_FEATURE.STATE_STORE_MULTIPLE_COLUMN_FAMILIES).
The other production stateful path here is ``applyInPandasWithState``
(stateful.py), tested end-to-end with no bootstrap needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id LONG, n_seen LONG, top1 DOUBLE, top2 DOUBLE, top3 DOUBLE"
)
_STATE_SCHEMA = "n LONG, v1 DOUBLE, v2 DOUBLE, v3 DOUBLE"
_NEG = float("-inf")  # sentinel for an empty leaderboard slot


class TopPurchasesProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("top3", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, v1, v2, v3 = self._state.get()
        else:
            n, v1, v2, v3 = 0, _NEG, _NEG, _NEG
        vals = [v for v in (v1, v2, v3) if v != _NEG]
        for pdf in rows:
            n += len(pdf)
            vals.extend(float(x) for x in pdf["value"])
        top = sorted(vals, reverse=True)[:3]
        padded = (top + [_NEG, _NEG, _NEG])[:3]
        self._state.update((n, *padded))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n],
                "top1": [None if padded[0] == _NEG else padded[0]],
                "top2": [None if padded[1] == _NEG else padded[1]],
                "top3": [None if padded[2] == _NEG else padded[2]],
            }
        )

    def close(self) -> None:
        pass


def running_top_purchases(events: DataFrame) -> DataFrame:
    """Per-user incremental top-3 purchase values via
    ``transformWithStateInPandas`` (update mode, processing-time)."""
    return (
        events.filter(events.event_type == "purchase")
        .select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TopPurchasesProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="None",
        )
    )
