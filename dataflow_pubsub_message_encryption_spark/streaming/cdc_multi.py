"""Multi-table-consistent streaming CDC sink (VERDICT r8 item 7).

``cdc.py`` maintains ONE table per snapshot; a real CDC feed usually
lands in several (header + detail, current-state + rollup). The
cross-table atomicity requirement: the ON-DISK state must never hold
table A at batch b and table B at batch b-1 (a crash+replay must never
fold a batch into one table twice or into only one of them). Readers
that open the pair while no swap is running — the foreachBatch cadence
— inherit that consistency; a reader racing a live swap needs the
immutable-version commit log (:mod:`.versioned`) instead, see
:func:`multi_current_view`.

The design makes N-table atomicity STRUCTURAL rather than adding a
multi-rename protocol: all N tables are children of ONE snapshot dir
(``current/<table>/``), every micro-batch writes ALL N tables into one
``.tmp-{b}/<table>/`` staging dir, and the existing single-rename
crash-safe swap (:mod:`._snapshot` — unchanged, its whole drill suite
still applies) moves the umbrella dir. This is the same root-pointer
idea a table format uses for multi-table transactions (one manifest
swap publishes every member table); on a filesystem the directory
rename IS the root pointer. The marker journal, at-least-once skip
rule, and all four recovery states are inherited verbatim — the N-table
drill in tests/test_streaming.py replays every crash point and asserts
the CROSS-TABLE invariant (both tables always reflect the same batch
prefix) instead of single-table counts.

The demo pair folds the events CDC feed into: ``users`` (latest-wins
row per user — the cdc.py merge) and ``totals`` (per-event-type count +
value sum — a non-idempotent SUM merge, the hardest replay case). Both
merges are associative/commutative, so any micro-batch split folds to
the batch result; the stream≡batch test pins that.

Scale notes (100 TB): identical to cdc.py — each batch shuffles one
candidate row per (partition, key) per table, and the rewrite cost is
snapshot size. Partitioning the member tables by key range inside the
umbrella (or a row-level-merge table format) bounds the rewrite; the
swap protocol is unchanged either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._snapshot import marker_value, recover_snapshot, swap_in
from .cdc import _batch_contrib, _merge

_SNAPSHOT = "current"
_MARKER = "_last_batch_id"
TABLES = ("users", "totals")


def _totals_contrib(batch_df: DataFrame) -> DataFrame:
    return batch_df.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("value_sum")
    )


def _totals_merge(snapshot: DataFrame | None, contrib: DataFrame) -> DataFrame:
    if snapshot is None:
        return contrib
    return (
        snapshot.unionByName(contrib)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("value_sum").alias("value_sum"))
    )


def multi_upsert_sink(events: DataFrame, target_dir: str, checkpoint_dir: str):
    """foreachBatch MERGE into TWO tables under one atomic snapshot.
    Returns the (unstarted) ``DataStreamWriter``; read the result with
    :func:`multi_current_view`."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        recover_snapshot(target_dir, _SNAPSHOT, _MARKER)
        if batch_id <= marker_value(target_dir, _MARKER):
            return  # replayed batch: already folded into BOTH tables
        spark = batch_df.sparkSession
        cur = os.path.join(target_dir, _SNAPSHOT)
        tmp = os.path.join(target_dir, f".tmp-{batch_id}")

        def _read(table: str) -> DataFrame | None:
            path = os.path.join(cur, table)
            return spark.read.parquet(path) if os.path.isdir(path) else None

        # stage EVERY member table before any rename — the umbrella tmp
        # is only complete once all N writes finished, and swap_in's
        # completeness witnesses (.old-{b} / marker == b) cover the
        # whole dir, not a member
        users = _merge(_read("users"), _batch_contrib(batch_df))
        users.write.mode("overwrite").parquet(os.path.join(tmp, "users"))
        totals = _totals_merge(_read("totals"), _totals_contrib(batch_df))
        totals.write.mode("overwrite").parquet(os.path.join(tmp, "totals"))

        swap_in(target_dir, _SNAPSHOT, _MARKER, batch_id)

    os.makedirs(target_dir, exist_ok=True)
    return (
        events.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )


def multi_current_view(
    spark: SparkSession, target_dir: str
) -> dict[str, DataFrame]:
    """Both member tables of the live snapshot, read under one root.

    Consistency contract: the pair is batch-consistent when no swap runs
    concurrently (the foreachBatch sink swaps BETWEEN micro-batches;
    read after the stream drains, or between triggers). The two reads
    here are lazy and independent, so a reader racing a live swap could
    resolve them against different batches — or hit deleted files once
    the old umbrella is dropped. A concurrent-reader deployment wants
    the commit-log format instead (:mod:`.versioned`): versions are
    immutable, a reader pins one, and only ``vacuum`` drops it."""
    cur = os.path.join(target_dir, _SNAPSHOT)
    return {t: spark.read.parquet(os.path.join(cur, t)) for t in TABLES}
