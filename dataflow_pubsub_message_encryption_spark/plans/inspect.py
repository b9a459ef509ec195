"""Physical-plan inspection: the 100 TB design contract, asserted.

"Would this plan survive a 100× scale-up?" is checkable: broadcast joins
must actually broadcast, filters must reach the parquet scan
(PushedFilters), projections must prune the read schema, and shuffle
counts must match the design. Tests use these helpers so plan regressions
(a broadcast silently becoming a sort-merge, a filter stuck above a UDF)
fail CI rather than surfacing as a 100 TB incident.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries (Exchange operators) in the physical
    plan. AQE may coalesce at runtime, but a plan with N exchanges pays at
    most N shuffles — the number to minimize. Counts the details-section
    headers only (the formatted output also lists each operator in the
    tree)."""
    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or (
        "BroadcastNestedLoopJoin" in formatted_plan(df)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names each parquet scan actually reads (column pruning)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out
