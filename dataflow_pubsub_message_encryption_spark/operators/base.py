"""Per-module query/oracle registries.

Every operator module creates its own registry via :func:`make_registry`
and decorates each query; ``operators.registry()`` merges them for
``__spark_entry__``. A query is a ``(spark, sf_dir) -> DataFrame`` callable;
its oracle (when EXACT-expressible) is the DuckDB SQL computing the
identical result over the pre-registered fixture views.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QueryFn = Callable[..., Any]


def make_registry() -> tuple[dict[str, QueryFn], dict[str, str], Callable]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}

    def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            queries[name] = fn
            if oracle is not None:
                oracles[name] = oracle
            return fn

        return deco

    return queries, oracles, query
