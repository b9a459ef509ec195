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
from pyspark.sql import functions as F
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


# --- event-time timers: session-timeout emission (VERDICT r8 item 4) -------

SESSION_OUTPUT_SCHEMA = (
    "user_id LONG, session_start LONG, session_end LONG, n_events LONG"
)
_SESSION_STATE_SCHEMA = "start LONG, last LONG, n LONG"
_GAP_MS = 30 * 60 * 1000  # same 30-min inactivity gap as sessionize_gap_sql


class SessionTimeoutProcessor(StatefulProcessor):
    """The canonical TIMER use: gap sessionization where the session
    summary is emitted by an EVENT-TIME TIMER once the watermark proves
    the session can no longer grow (last event + gap <= watermark) — the
    half of the Spark-4 stateful surface `TopPurchasesProcessor` (state
    only, timeMode None) leaves untouched.

    State per user: the open-session list (start, last, n) — normally a
    single row; in-batch disorder is handled by sorting and re-merging,
    so ANY split of an ordered replay folds to the batch session set.
    One timer per key, kept at min(last)+gap over open sessions: fires
    -> emit every ripe session, re-arm for the remainder. Scale: state ∝
    open sessions per user (watermark-bounded), timer count ∝ keys with
    open state — both evicted on flush; RocksDB provider for big key
    spaces, as with every transformWithState op."""

    def __init__(self, gap_ms: int = _GAP_MS) -> None:
        self._gap = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sessions = handle.getListState("sessions", _SESSION_STATE_SCHEMA)

    def _load(self) -> list[tuple]:
        return [tuple(t) for t in self._sessions.get()] if self._sessions.exists() else []

    def _rearm(self, sessions: list[tuple]) -> None:
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        if sessions:
            self._handle.registerTimer(
                min(last for _, last, _ in sessions) + self._gap
            )

    def handleInputRows(self, key, rows, timerValues):
        cur = self._load()
        for pdf in rows:
            cur.extend((int(t), int(t), 1) for t in pdf["ts_ms"])
        cur.sort()
        merged: list[tuple] = []
        for s, last, n in cur:
            if merged and s <= merged[-1][1] + self._gap:
                ps, pl, pn = merged[-1]
                merged[-1] = (ps, max(pl, last), pn + n)
            else:
                merged.append((s, last, n))
        self._sessions.put(merged)
        self._rearm(merged)
        return iter([])  # sessions emit ONLY at timer expiry

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        wm = timerValues.getCurrentWatermarkInMs()
        keep, ripe = [], []
        for s, last, n in self._load():
            (ripe if last + self._gap <= wm else keep).append((s, last, n))
        if keep:
            self._sessions.put(keep)
        else:
            self._sessions.clear()
        self._rearm(keep)
        if ripe:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]] * len(ripe), dtype="int64"),
                    "session_start": pd.Series(
                        [s for s, _, _ in ripe], dtype="int64"
                    ),
                    "session_end": pd.Series(
                        [last for _, last, _ in ripe], dtype="int64"
                    ),
                    "n_events": pd.Series(
                        [n for _, _, n in ripe], dtype="int64"
                    ),
                }
            )

    def close(self) -> None:
        pass


def session_timeout_summaries(
    events: DataFrame, watermark: str = "10 minutes", gap_minutes: int = 30
) -> DataFrame:
    """Per-user gap sessions emitted at event-time timer expiry
    (append mode, timeMode EventTime). The stream≡batch test pins the
    emitted set against the batch lag-then-cumsum sessionization
    restricted to sessions the final watermark actually closed."""
    return (
        events.select(
            "user_id", "ts", F.unix_millis("ts").alias("ts_ms")
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionTimeoutProcessor(gap_minutes * 60 * 1000),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="EventTime",
        )
    )
