"""Operator inventory assembly (SURVEY §2 contract).

Modules register queries + DuckDB oracles at import; ``registry()`` merges
them into the dicts ``__spark_entry__`` exposes to the driver.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = [
    "ref_pipeline",
    "relational",
    "tpch",
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "sampling",
    "curation",
    "cdc",
    "graph",
    "behavior",
]


def registry() -> tuple[dict, dict]:
    queries: dict = {}
    oracles: dict = {}
    for name in _MODULES:
        mod = import_module(f".{name}", __package__)
        for k in mod.QUERIES:
            if k in queries:
                raise ValueError(f"duplicate query key: {k}")
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
