"""Vector math over ``array<float>`` embedding columns.

Spark has no builtin cosine similarity (probed 4.1.2), so these compose
``zip_with`` / ``aggregate`` — still JVM-side codegen, no Python. Arrays are
cast to ``array<double>`` first: both engines then sum 64 doubles in index
order, giving bit-identical accumulation vs the DuckDB oracle
(``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``) up to the 6dp
rounding discipline.

Scale note: for top-k against one probe vector the probe is a literal /
broadcast — the scan stays embarrassingly parallel, no shuffle until the
final TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(c: Column | str) -> Column:
    c = c if isinstance(c, Column) else F.col(c)
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot32(a: Column, b: Column) -> Column:
    """Dot of two raw ``array<float>`` columns accumulated in double —
    the cast happens per element INSIDE the fold, so callers can ship the
    4-byte float arrays through a shuffle and still get values identical
    to ``dot(as_double(a), as_double(b))`` (float32→float64 is exact, and
    the products/accumulation are the same doubles in the same index
    order). Exists for the self-join ops where the vector rides an
    exchange: carrying floats instead of pre-cast doubles cuts the
    carried row width (measured on the embedding-LSH bucket exchange:
    404.2 → 274.9 compressed B/row — see ``_emb_lsh_pairs_body``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
