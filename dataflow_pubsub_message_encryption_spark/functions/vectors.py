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


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
