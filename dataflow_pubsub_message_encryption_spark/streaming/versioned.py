"""Minimal local commit-log table format (VERDICT r8 'missing' item 4).

Delta/Iceberg are unavailable offline; this module implements the part
of a transactional table format the engine's sinks actually need — an
append-only COMMIT LOG of immutable versioned snapshots with an atomic
root pointer — so a streaming MERGE target gets:

- **Atomic multi-table commits**: one log entry names every member
  table's snapshot dir; the commit point is a single ``os.replace`` of
  the ``_latest`` pointer (the catalog-swap idea of Iceberg's root
  metadata: readers either see version n-1 entirely or n entirely).
- **Time travel**: versions are immutable directories; ``read_version``
  serves any retained version, ``history`` returns the log.
- **Exactly-once under at-least-once replay**: each log entry carries
  the micro-batch id; the replay rule is "skip iff batch_id <= the
  COMMITTED latest's batch_id". The pointer is the single source of
  truth — a log entry without the pointer advanced is an UNCOMMITTED
  leftover and recovery drops it (roll-back, never roll-forward: the
  replayed batch recomputes the identical snapshot from the committed
  parent, so dropping is exactly-once; rolling forward would have to
  prove the snapshot write finished, which only the pointer attests).

Layout::

    target/
      _latest            <- "3"           (atomic pointer, commit point)
      _log/v3.json       <- {"version":3,"batch_id":7,"tables":{...}}
      v3/users/*.parquet  v3/totals/*.parquet   (immutable)

Crash points (drilled in tests/test_streaming_r9.py):
  (a) after snapshot dirs, before log entry  -> orphan v-dir, dropped;
  (b) after log entry, before pointer swap   -> uncommitted log entry +
      v-dir, both dropped; replay redoes the batch from the committed
      parent;
  (c) mid-pointer-write                      -> write-aside + replace
      means the pointer is never torn; the aside file is swept.

Scale notes: a commit costs one snapshot write + two tiny journaled
files — the same cost profile as the umbrella swap (cdc_multi), plus
retained history. Version retention is the user's vacuum policy
(``vacuum`` keeps the newest K); on 100 TB targets the member tables
partition by key range so a batch rewrites only touched partitions —
orthogonal to the log, exactly as in cdc.py.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_LATEST = "_latest"
_LOG = "_log"


def _write_atomic(path: str, data: str) -> None:
    aside = path + ".w"
    with open(aside, "w") as fh:
        fh.write(data)
    os.replace(aside, path)


def latest_version(target_dir: str) -> int:
    """The committed version, or -1 before the first commit."""
    p = os.path.join(target_dir, _LATEST)
    if os.path.exists(p):
        with open(p) as fh:
            return int(fh.read().strip())
    return -1


def _log_path(target_dir: str, version: int) -> str:
    return os.path.join(target_dir, _LOG, f"v{version}.json")


def log_entry(target_dir: str, version: int) -> dict:
    with open(_log_path(target_dir, version)) as fh:
        return json.load(fh)


def history(target_dir: str) -> list[dict]:
    """Committed log entries, oldest first (time-travel catalog)."""
    n = latest_version(target_dir)
    out = []
    for v in range(n + 1):
        p = _log_path(target_dir, v)
        if os.path.exists(p):  # vacuumed versions drop out of history
            out.append(log_entry(target_dir, v))
    return out


def committed_batch_id(target_dir: str) -> int:
    """Batch id of the committed latest, or -1 (the replay skip rule)."""
    n = latest_version(target_dir)
    return log_entry(target_dir, n)["batch_id"] if n >= 0 else -1


def recover(target_dir: str) -> None:
    """Roll back anything past the committed pointer: uncommitted log
    entries, orphan v-dirs, torn write-asides. Re-runnable (each rule
    re-derives the same state)."""
    for aside in glob.glob(os.path.join(target_dir, "*.w")) + glob.glob(
        os.path.join(target_dir, _LOG, "*.w")
    ):
        os.remove(aside)
    n = latest_version(target_dir)
    for p in glob.glob(os.path.join(target_dir, _LOG, "v*.json")):
        v = int(os.path.basename(p)[1:-5])
        if v > n:
            os.remove(p)  # uncommitted log entry: the pointer never moved
    for d in glob.glob(os.path.join(target_dir, "v*")):
        base = os.path.basename(d)
        if not os.path.isdir(d) or not base[1:].isdigit():
            continue
        if int(base[1:]) > n:
            shutil.rmtree(d, ignore_errors=True)  # orphan snapshot


def commit(
    target_dir: str,
    batch_id: int,
    write_tables,  # Callable[[str], dict[str, str]]: version_dir -> {table: relpath}
) -> int:
    """Run one commit: ``write_tables(version_dir)`` materializes every
    member table under the new immutable version dir and returns the
    table->relative-path map; then the log entry and the pointer land in
    that order. Returns the new version. Caller must have applied the
    replay skip rule first (``batch_id <= committed_batch_id`` -> skip)."""
    version = latest_version(target_dir) + 1
    vdir = os.path.join(target_dir, f"v{version}")
    tables = write_tables(vdir)
    os.makedirs(os.path.join(target_dir, _LOG), exist_ok=True)
    _write_atomic(
        _log_path(target_dir, version),
        json.dumps(
            {"version": version, "batch_id": batch_id, "tables": tables}
        ),
    )
    _write_atomic(os.path.join(target_dir, _LATEST), str(version))  # COMMIT
    return version


def read_version(
    spark: SparkSession, target_dir: str, version: int | None = None
) -> dict[str, DataFrame]:
    """Member tables of ``version`` (default: committed latest) — time
    travel is just reading an older immutable version."""
    v = latest_version(target_dir) if version is None else version
    entry = log_entry(target_dir, v)
    return {
        t: spark.read.parquet(os.path.join(target_dir, rel))
        for t, rel in entry["tables"].items()
    }


def vacuum(target_dir: str, keep: int) -> list[int]:
    """Drop all but the newest ``keep`` committed versions (their v-dirs
    and log entries); returns the dropped version numbers. The committed
    latest is never dropped — ``keep`` is clamped to >= 1, else keep=0
    would delete the live version's log entry out from under the
    ``_latest`` pointer and wedge the replay skip rule."""
    keep = max(1, keep)
    n = latest_version(target_dir)
    dropped = []
    for v in range(max(0, n - keep + 1)):
        p = _log_path(target_dir, v)
        if os.path.exists(p):
            os.remove(p)
            shutil.rmtree(
                os.path.join(target_dir, f"v{v}"), ignore_errors=True
            )
            dropped.append(v)
    return dropped


def versioned_upsert_sink(
    events: DataFrame, target_dir: str, checkpoint_dir: str
):
    """The cdc_multi two-table MERGE retargeted at the commit log: each
    micro-batch commits a NEW immutable version of (users, totals) —
    atomic across both tables, time-travelable, exactly-once under
    replay. Returns the unstarted ``DataStreamWriter``."""
    from .cdc import _batch_contrib, _merge
    from .cdc_multi import _totals_contrib, _totals_merge

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        recover(target_dir)
        if batch_id <= committed_batch_id(target_dir):
            return  # replayed batch: version already committed
        spark = batch_df.sparkSession
        cur = (
            read_version(spark, target_dir)
            if latest_version(target_dir) >= 0
            else {"users": None, "totals": None}
        )
        users = _merge(cur["users"], _batch_contrib(batch_df))
        totals = _totals_merge(cur["totals"], _totals_contrib(batch_df))

        def write_tables(vdir: str) -> dict[str, str]:
            users.write.mode("overwrite").parquet(os.path.join(vdir, "users"))
            totals.write.mode("overwrite").parquet(
                os.path.join(vdir, "totals")
            )
            base = os.path.basename(vdir)
            return {"users": f"{base}/users", "totals": f"{base}/totals"}

        commit(target_dir, batch_id, write_tables)

    os.makedirs(target_dir, exist_ok=True)
    return (
        events.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
