"""Custom Python streaming DataSource (Spark 4 ``pyspark.sql.datasource``)
— the Pub/Sub-shaped replay source (VERDICT r8 item 5; pacing + drift
guards VERDICT r9 item 2 / ADVICE r9 items 2-3).

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
  any V2 source. Each offset also carries ``fp``, a fingerprint of the
  delivery plan, so a checkpoint restarted over a CHANGED segment
  directory (files added/removed/renamed, redeliver knob flipped) fails
  loudly in ``partitions`` instead of silently re-mapping committed
  entries to different files (ADVICE r9 item 2).
- **Pacing** (``max_segments_per_batch=K``, default 0 = unbounded):
  ``latestOffset`` reports ``min(floor + K, head)`` instead of the full
  plan head, so a cold start or a restarted backlog drains in ⌈N/K⌉
  micro-batches instead of one unbounded batch (VERDICT r9 item 2 — a
  100 TB backlog through the unpaced form is one giant batch). The
  Python API gives ``latestOffset`` no view of the committed offset and
  no ReadLimits hook (pyspark 4.1 ``DataSourceStreamReader`` — verified
  against the installed source), so the floor is restart-safe by OTHER
  channels, none of them an instance-local counter (the r8 self-review
  trap): (1) ``commit(end)`` journals the floor to an atomic
  ``progress_path`` file the next instance reads at construction —
  point it INSIDE the query's checkpoint dir so both share a
  lifecycle; (2) ``partitions(start, end)`` bumps the floor to the
  engine-supplied ``end`` — the planned batch head the engine journals
  to its offset log before running the batch (the Kafka
  maxOffsetsPerTrigger pacing shape), which covers both the in-run
  cadence (``commit()`` can land after the next poll on some trigger
  paths) and the restart-replay of an uncommitted batch (the same
  checkpointed range re-plans and re-bumps); (3) a LOST progress file
  never regresses the head (ADVICE r10 — Spark compares offsets by
  EQUALITY, so a cold ``min(K, len)`` head on a restarted backlog that
  lands *behind* the committed offset would be journaled as a batch end
  and make later batches re-plan delivered segments). When the
  progress file is absent, the floor seeds from the ENGINE'S OWN
  OFFSET LOG (the ``offsets/`` dir beside the progress file, per its
  documented inside-the-checkpoint placement) — lazily, at the first
  paced poll, because the engine creates the log dirs after reader
  construction: an existing-but-empty log is provably a fresh start
  (pacing begins at 0 — necessary because the engine polls
  ``latestOffset`` BEFORE ``initialOffset`` on a fresh start),
  entries seed the floor from the last journaled
  batch end, and an unreadable/missing/foreign log leaves the floor
  UNSEEDED, in which case a paced ``latestOffset`` DEGRADES to the
  full plan head — never behind committed (``partitions`` rejects
  ``end > len(plan)``), worst case one unpaced batch. A stale-poll
  self-heal remains as a belt-and-braces unpark: three consecutive
  identical ``latestOffset`` polls with no intervening plan/commit
  activity advance the floor one K-step.
- **At-least-once**: ``redeliver_first=true`` re-plans segment 0 as a
  SECOND delivery (its own planned entry, tagged delivery=2) — the
  Pub/Sub redelivery case — so consumer-side dedup
  (``dropDuplicatesWithinWatermark`` / R11) is what establishes
  effectively-once, exactly as the reference relies on [U/H]. The
  duplicate is bit-identical payload + attrs. Unpaced, the whole plan
  (redelivery included) can land in one micro-batch under
  processAllAvailable/availableNow (ADVICE r9 item 3); with pacing the
  redelivery entry genuinely arrives in a LATER micro-batch than the
  first delivery — tested both ways.
- **Executor-side reads**: ``partitions()`` ships (segment, path)
  partitions; ``read()`` runs in the Python worker and reads its file
  with pyarrow — the driver never touches row data (the 100 TB
  contract; a real subscription source would pull its assigned
  bundle the same way).

``commit(end)`` journals pacing progress; segments themselves are
durable files — a broker-backed source would also ack up to ``end``
here.
"""

from __future__ import annotations

import glob
import hashlib
import json
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

_SELF_HEAL_POLLS = 3  # identical idle polls before the pause-unpark step


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
        # plan fingerprint: basenames + delivery tags, order-sensitive —
        # rides in every offset so a restart over a drifted plan is an
        # error, not a silent re-mapping
        self._fp = hashlib.sha256(
            "\n".join(f"{os.path.basename(f)}#{d}" for f, d in self._plan).encode()
        ).hexdigest()[:12]
        self._k = int(options.get("max_segments_per_batch", 0) or 0)
        if self._k < 0:
            raise ValueError("max_segments_per_batch must be >= 0")
        self._progress_path = options.get("progress_path")
        # restart-safe pacing floor: progress file (commit-journaled by a
        # prior instance) is the primary channel; partitions() bumps it
        # from checkpoint truth; commit() keeps it current in-run.
        # _seeded tracks whether ANY authoritative channel has spoken —
        # a valid progress file here, initialOffset (fresh start, so the
        # committed offset is provably 0), or an engine partitions()/
        # commit() call. Until then a paced latestOffset must NOT report
        # a cold floor+K head: on a restart with a lost progress file
        # that head can land BEHIND the committed offset, and Spark
        # compares offsets by EQUALITY — the regressed head would be
        # journaled as a batch end and a later batch would start from
        # it, re-planning already-delivered segments (ADVICE r10).
        progress = self._read_progress()
        if progress is not None:
            self._floor, self._seeded = progress, True
        else:
            self._floor, self._seeded = self._seed_from_offset_log()
        # A present progress file is a CACHE of checkpoint truth, not the
        # truth itself: one restored from backup (or rewound by an
        # operator) can sit BEHIND the engine's committed offset, and a
        # floor seeded from it alone would report a behind-committed head
        # — journaled as a batch end, the offset log would REGRESS (the
        # ADVICE r10 failure mode, which the r11 fix closed only for the
        # ABSENT-file case). The first paced poll therefore also consults
        # the engine's own offset log and takes the max of both channels
        # (_merge_offset_log_floor); _log_merged tracks that one-shot.
        self._log_merged = False
        self._last_poll = -1
        self._stale_polls = 0

    # --- durable pacing floor -------------------------------------------

    def _read_progress(self):
        """Committed pacing entry from the progress file, or ``None`` when
        the file is missing/unreadable/from a different plan — the caller
        distinguishes 'known to be 0' from 'unknown'."""
        if not self._progress_path:
            return None
        try:
            with open(self._progress_path) as fh:
                rec = json.load(fh)
            # a progress file from a DIFFERENT plan must not seed the
            # floor (e.g. fresh checkpoint + stale file): treat as absent
            # — offsets-vs-plan drift is partitions()' job to reject
            if rec.get("fp") != self._fp:
                return None
            return max(0, int(rec["entry"]))
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return None

    def _seed_from_offset_log(self) -> tuple:
        """Checkpoint-truth floor seeding when the progress file is
        absent: the engine's own offset log (the ``offsets/`` dir beside
        the progress file, per the documented inside-the-checkpoint
        placement) is the source of truth the progress file merely
        caches. An EXISTING-but-EMPTY log is provably a fresh start (the
        engine creates the log dir before the first poll, and no batch
        was ever planned) -> floor 0 is authoritative and pacing starts
        immediately. Entries present -> restart: seed from the last
        journaled batch end (>= committed, and a replayed uncommitted
        batch re-plans its checkpointed range regardless — never a skip).
        A missing dir, unreadable entry, or foreign fingerprint leaves
        the floor UNSEEDED, which a paced poll degrades to the full plan
        head (see latestOffset). Probed against the installed engine:
        a fresh start polls latestOffset BEFORE initialOffset, so
        construction-time seeding is the only channel that can keep a
        cold start paced."""
        if not self._progress_path:
            return 0, False
        odir = os.path.join(os.path.dirname(self._progress_path), "offsets")
        if not os.path.isdir(odir):
            return 0, False  # placement unknown: stay unseeded
        batches = [n for n in os.listdir(odir) if n.isdigit()]
        if not batches:
            return 0, True  # provably fresh: no batch ever journaled
        try:
            with open(os.path.join(odir, max(batches, key=int))) as fh:
                lines = [ln for ln in fh.read().splitlines() if ln.strip()]
            rec = json.loads(lines[-1])
            if rec.get("fp") != self._fp:
                return 0, False  # foreign plan (or not our source's line)
            return max(0, int(rec["entry"])), True
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return 0, False

    def _bump_floor(self, entry: int) -> None:
        if entry <= self._floor:
            return
        self._floor = entry
        self._stale_polls = 0
        if self._progress_path and self._k:
            tmp = f"{self._progress_path}.w"
            with open(tmp, "w") as fh:
                json.dump({"entry": entry, "fp": self._fp}, fh)
            os.replace(tmp, self._progress_path)  # atomic on POSIX

    # --- offsets ----------------------------------------------------------

    def initialOffset(self) -> dict:
        # only ever called on a FRESH start (empty offset log), so the
        # committed offset is provably 0 and the 0-floor is
        # authoritative. NB the engine polls latestOffset BEFORE this on
        # a fresh start (probed against the installed engine), so this
        # channel alone cannot keep a cold start paced — that is
        # _seed_from_offset_log's job; this is belt-and-braces.
        self._seeded = True
        return {"entry": 0, "fp": self._fp}

    def _merge_offset_log_floor(self) -> None:
        """One-shot on the first paced poll: lift the floor to the engine
        offset log's last journaled batch end if that is AHEAD of the
        progress-file floor (rewound/restored progress file — see the
        constructor comment). Only marks itself done once the log has
        spoken authoritatively, so a poll that races the engine's log-dir
        creation retries on the next poll."""
        entry, seeded = self._seed_from_offset_log()
        if seeded:
            self._log_merged = True
            if entry > self._floor:
                self._floor = entry

    def latestOffset(self) -> dict:
        head = len(self._plan)
        if self._k:
            if self._seeded and not self._log_merged:
                self._merge_offset_log_floor()
            if not self._seeded:
                # re-attempt offset-log seeding LAZILY: at construction
                # the engine has not created the checkpoint log dirs yet
                # (probed: init sees no offsets/ dir; the first poll sees
                # it, empty on a fresh start), so construction-time
                # seeding alone would mis-read every fresh start as
                # placement-unknown and un-pace the first batch
                self._floor, self._seeded = self._seed_from_offset_log()
            if not self._seeded:
                # restart with a lost/foreign progress file: the committed
                # offset is unknown here and a cold floor+K head could
                # land BEHIND it — journaled as a batch end, it would make
                # a later batch re-plan delivered segments (ADVICE r10).
                # Degrade to the full plan head for this poll (it can
                # never be behind committed: partitions() rejects end >
                # plan length, so every committed entry is <= len(plan));
                # the engine's next partitions()/commit() call re-seeds
                # the floor from checkpoint truth and pacing resumes. The
                # worst case is one unpaced batch after losing the file,
                # never a skip or duplicate.
                self._last_poll = head
                return {"entry": head, "fp": self._fp}
            head = min(self._floor + self._k, head)
            if head == self._last_poll:
                # idle-pause self-heal: latest == committed with a lost
                # progress file parks the stream (the engine plans no
                # batch, so no commit/partitions call will ever move the
                # floor); after _SELF_HEAL_POLLS identical polls with no
                # intervening activity, take one K-step. Never skips:
                # batch ranges come from the checkpointed start.
                self._stale_polls += 1
                if self._stale_polls >= _SELF_HEAL_POLLS:
                    self._stale_polls = 0
                    self._bump_floor(head)
                    head = min(self._floor + self._k, len(self._plan))
            else:
                self._stale_polls = 0
        self._last_poll = head
        return {"entry": head, "fp": self._fp}

    def partitions(self, start: dict, end: dict):
        for name, off in (("start", start), ("end", end)):
            got = off.get("fp")
            if got is not None and got != self._fp:
                raise ValueError(
                    f"pubsub_replay: checkpointed {name} offset fingerprint "
                    f"{got!r} does not match the current delivery plan "
                    f"{self._fp!r} — the segment directory or the "
                    "redeliver_first option changed since the checkpoint "
                    "was written; committed entries would re-map to "
                    "different files. Restore the original plan or start "
                    "a fresh checkpoint."
                )
        if end["entry"] > len(self._plan):
            raise ValueError(
                f"pubsub_replay: checkpointed end entry {end['entry']} "
                f"exceeds the current plan length {len(self._plan)} — "
                "segments were removed since the checkpoint was written."
            )
        # the engine-supplied END is the planned batch head, journaled in
        # the offset log BEFORE the batch runs: bump the pacing floor to
        # it so the next poll paces K beyond the last PLANNED batch (the
        # Kafka maxOffsetsPerTrigger shape) — crucially NOT dependent on
        # the engine's commit() timing, which lands after the next poll
        # on some trigger paths, and restart-safe: a replayed uncommitted
        # batch re-plans the same checkpointed range and re-bumps
        self._seeded = True  # engine-supplied range = checkpoint truth
        self._log_merged = True  # ...so the log merge is moot from here on
        self._bump_floor(end["entry"])
        return [
            _Segment(i, self._plan[i][0], self._plan[i][1])
            for i in range(start["entry"], end["entry"])
        ]

    def read(self, partition: _Segment):
        # executor-side: read ONLY this partition's segment, and hand the
        # engine Arrow RecordBatches instead of per-row tuples (the
        # documented fast path of pyspark.sql.datasource — the round-11
        # paced-drain soak measured the tuple path at ~0.9M rows/s across
        # 32 workers, serializer-bound; columnar assembly removes the
        # per-row Python loop entirely)
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        try:
            tbl = pq.read_table(
                partition.path,
                columns=["event_id", "ts", "user_id", "event_type", "props"],
            )
        # Only DECODE-class failures may get the torn-write diagnosis, and
        # probed types alone can't separate them: pyarrow raises
        # ArrowInvalid for BOTH a bad-magic/truncated file AND a missing
        # column (schema drift after a producer upgrade). Disambiguate by
        # re-opening just the footer: a readable footer means the bytes
        # are intact and the operator must NOT be sent to restore them
        # (ADVICE r13) — name the drifted columns instead. Permission
        # problems propagate unwrapped (an OSError subclass, deliberately
        # excluded); only an unreadable footer earns the torn-write
        # runbook message.
        except PermissionError:
            raise
        except (pa.lib.ArrowInvalid, OSError) as e:
            try:
                footer_names = set(
                    pq.ParquetFile(partition.path).schema_arrow.names
                )
            except Exception:
                footer_names = None
            if footer_names is not None:
                want = ["event_id", "ts", "user_id", "event_type", "props"]
                missing = [c for c in want if c not in footer_names]
                hint = (
                    f"missing expected column(s) {missing} — likely "
                    "producer schema drift, not corruption"
                    if missing
                    else "footer and schema are valid — NOT a torn write; "
                    "check column types / page-level corruption"
                )
                raise RuntimeError(
                    f"pubsub_replay: segment {partition.path!r} failed to "
                    f"read ({type(e).__name__}: {e}) but its footer opens "
                    f"cleanly: {hint}. Do not restore bytes; fix the "
                    "producer or the reader schema, then restart from the "
                    "checkpoint."
                ) from e
            # fall through: torn tail / missing footer / bad magic
            # A segment that globbed into the plan but cannot be read is
            # a producer protocol violation (a non-atomic write crashed
            # mid-file: producers must stage to '<name>.parquet.w' and
            # os.replace into place — the '*.parquet' plan glob never
            # sees an aside). Fail LOUDLY with the file named: the batch
            # is already journaled in the offset log, so once the
            # producer repairs/replaces the segment, a checkpoint restart
            # replays exactly this range and converges with no dup/skip
            # (drilled in tests/test_round13_ops.py, VERDICT r12 item 6).
            raise RuntimeError(
                f"pubsub_replay: segment {partition.path!r} is unreadable "
                f"({type(e).__name__}: {e}) — likely a torn write from a "
                "producer that crashed mid-file without staging to a "
                "'.w' aside. Restore the segment bytes, then restart the "
                "query from its checkpoint; the journaled batch replays "
                "this exact range."
            ) from e
        n = tbl.num_rows
        value = pc.cast(
            pc.fill_null(tbl["props"].combine_chunks(), ""), pa.binary()
        )
        # attrs MAP<STRING,STRING>: 3 fixed keys per row, values
        # interleaved columnar (object-dtype strided assignment — no
        # per-row dict construction)
        keys = np.empty(3 * n, dtype=object)
        keys[0::3], keys[1::3], keys[2::3] = "event_type", "user_id", "delivery"
        items = np.empty(3 * n, dtype=object)
        items[0::3] = tbl["event_type"].to_pylist()
        # Edge semantics pinned explicitly (ADVICE r11): a NULL user_id
        # yields a NULL map value (valueContainsNull), NOT the literal
        # string 'None' the retired tuple path's str() produced — null
        # propagation is the semantics a Spark reader expects from a map
        # built over a nullable column.
        items[1::3] = pc.cast(tbl["user_id"].combine_chunks(), pa.string()).to_pylist()
        items[2::3] = str(partition.delivery)
        attrs = pa.MapArray.from_arrays(
            pa.array(np.arange(0, 3 * n + 3, 3, dtype=np.int32)[: n + 1]),
            pa.array(keys, pa.string()),
            pa.array(items, pa.string()),
        )
        # safe=False: truncate sub-microsecond components instead of
        # raising ArrowInvalid on ns-precision inputs — the engine schema
        # is µs and the retired tuple path's to_pydatetime() truncated
        # silently, so a ns-timestamped segment must keep draining
        # (ADVICE r11).
        publish_ts = pc.cast(
            tbl["ts"].combine_chunks(), pa.timestamp("us"), safe=False
        )
        yield pa.RecordBatch.from_arrays(
            [
                pc.cast(tbl["event_id"].combine_chunks(), pa.int64()),
                value,
                attrs,
                publish_ts,
            ],
            names=["event_id", "value", "attrs", "publish_ts"],
        )

    def commit(self, end: dict) -> None:
        # durable segments need no ack; journal the pacing floor so the
        # NEXT reader instance (checkpoint restart) resumes paced from
        # the committed entry instead of re-reporting a cold head
        self._seeded = True
        self._log_merged = True  # engine call = checkpoint truth
        self._bump_floor(end["entry"])


class PubsubReplayDataSource(DataSource):
    """``spark.dataSource.register(PubsubReplayDataSource)`` then
    ``spark.readStream.format("pubsub_replay").option("path", dir)``.

    Pacing: ``.option("max_segments_per_batch", K)`` bounds every
    micro-batch to K plan entries; pair it with
    ``.option("progress_path", f"{checkpoint_dir}/pubsub_progress.json")``
    so pacing survives restarts with the same lifecycle as the
    checkpoint itself."""

    @classmethod
    def name(cls) -> str:
        return "pubsub_replay"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> PubsubReplayStreamReader:
        return PubsubReplayStreamReader(self.options)
