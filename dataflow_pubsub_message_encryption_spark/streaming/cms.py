"""Streaming twin of ``agg_heavy_hitters_cms``: incremental Count-Min
sketch via foreachBatch counter-grid SUM merge.

The batch operator (operators/scale.py) folds the stream into a
``_CMS_DEPTH`` × ``_CMS_WIDTH`` counter grid. Cell counts ADD across any
split of the input — associative and commutative but **NOT idempotent**
(unlike the bitmap twin's bit_or): replaying a micro-batch would
double-count every cell it touched. This twin therefore exists to
exercise the at-least-once machinery for real — the batch-id marker
journal is correctness-critical here, and the shared crash-window
recovery (``_snapshot.recover_snapshot``) must restore a half-swapped
snapshot WITH its marker so the replayed batch skips instead of
re-summing (the exact scenario ADVICE r5 flagged and round 6 fixed).

Scale notes: the per-batch contribution partial-aggregates map-side to
≤ DEPTH×WIDTH cells; the snapshot is a few hundred longs regardless of
stream length; shard/day sketches union by the same cell-wise SUM.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scale import _CMS_DEPTH, _CMS_WIDTH
from ._snapshot import marker_value, recover_snapshot, swap_in

_SNAPSHOT = "cells"
_MARKER = "_last_batch_id"


def _batch_cells(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's CMS contribution — the same portable sha-nibble
    bucketing as the batch op (operators/scale.py::agg_heavy_hitters_cms),
    so stream-folded and batch-built grids are bit-identical."""
    key = F.col("user_id").cast("string")
    rows = []
    for i in range(_CMS_DEPTH):
        h = F.sha2(F.concat(F.lit(f"{i}:"), key), 256)

        def nib(j, h=h):
            return F.instr(F.lit("0123456789abcdef"), F.substring(h, j, 1)) - 1

        rows.append(
            F.struct(
                F.lit(i).alias("i"),
                ((nib(1) * 16 + nib(2)) % _CMS_WIDTH).alias("p"),
            )
        )
    return (
        batch_df.select(F.explode(F.array(*rows)).alias("ip"))
        .groupBy(F.col("ip.i").alias("i"), F.col("ip.p").alias("p"))
        .agg(F.count("*").alias("c"))
    )


def _merge(snapshot: DataFrame | None, contrib: DataFrame) -> DataFrame:
    if snapshot is None:
        return contrib
    return (
        snapshot.unionByName(contrib)
        .groupBy("i", "p")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def cms_sketch_sink(events: DataFrame, target_dir: str, checkpoint_dir: str):
    """Maintain the CMS cell grid from a stream. Returns the (unstarted)
    ``DataStreamWriter``; read estimates with :func:`cms_grid_view`."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        recover_snapshot(target_dir, _SNAPSHOT, _MARKER)
        if batch_id <= marker_value(target_dir, _MARKER):
            return  # replayed batch: SUM is NOT idempotent — skip
        spark = batch_df.sparkSession
        cur = os.path.join(target_dir, _SNAPSHOT)
        snap = spark.read.parquet(cur) if os.path.isdir(cur) else None
        merged = _merge(snap, _batch_cells(batch_df))
        tmp = os.path.join(target_dir, f".tmp-{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        # crash-safe swap + marker journal (first-batch vs steady-state
        # ordering differs — see streaming/_snapshot.py module docstring)
        swap_in(target_dir, _SNAPSHOT, _MARKER, batch_id)

    os.makedirs(target_dir, exist_ok=True)
    return (
        events.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )


def cms_grid_view(spark: SparkSession, target_dir: str) -> DataFrame:
    """The maintained (i, p, c) counter grid."""
    return spark.read.parquet(os.path.join(target_dir, _SNAPSHOT))
