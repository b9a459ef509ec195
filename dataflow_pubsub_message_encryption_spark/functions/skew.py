"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles joins, but a groupBy whose key
distribution is pathological (one hot key owning most rows) still funnels
a whole key into one reducer. The standard fix is salting: aggregate on
(key, salt) first — spreading the hot key over N reducers — then
re-aggregate on the key. Associative aggregates (count/sum/min/max) are
exact under this rewrite.

The salt must be deterministic for oracle reproducibility: derived from a
row identity column, not rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    salt_src: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max}. Phase 1 groups on (key, salt(salt_src)) and
    computes partials; phase 2 groups on key and merges (count->sum of
    partial counts, sum->sum, min->min, max->max).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt = (F.xxhash64(F.col(salt_src)) % n_salts).alias("_salt")

    phase1 = df.groupBy(F.col(key), salt).agg(
        *[
            getattr(F, fn)(F.col(src) if fn != "count" else F.lit(1)).alias(
                f"_p_{out}"
            )
            for out, (src, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(key).agg(
        *[
            getattr(F, merge_fn[fn])(F.col(f"_p_{out}")).alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )
