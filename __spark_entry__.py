"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dataflow_pubsub_message_encryption_spark/``;
operators register themselves with their oracles in
``operators/*`` (SURVEY.md §2 is the inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from dataflow_pubsub_message_encryption_spark.operators import registry
from dataflow_pubsub_message_encryption_spark.session import configure

_QUERIES, _ORACLES = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the whole reference pipeline in one DAG: scan events -> synthesize
    envelope-encrypted wire form (AES-GCM payload, wrapped DEK + MAC
    attributes, deterministic tamper on odd ids) -> cached DEK unwrap ->
    AES-decrypt -> MAC verify-and-drop -> JSON-parse -> hourly tumbling
    window counts + payload sums.
    """
    configure(spark)
    return _QUERIES["pipeline_end_to_end"](spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return dict(_ORACLES)
