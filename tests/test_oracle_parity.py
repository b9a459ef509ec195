"""Every registered query vs its DuckDB oracle at sf0.001 (fast local
mirror of the driver's t2 gate; tools/check.py runs the same at sf0.01)."""

from __future__ import annotations

import pandas as pd
import pytest

from dataflow_pubsub_message_encryption_spark.operators import registry

QUERIES, ORACLES = registry()


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    return sorted(df.itertuples(index=False, name=None), key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from dataflow_pubsub_message_encryption_spark.plans import formatted_plan

    qdf = QUERIES[name](spark, sf_dir)
    # Global sweep invariant (VERDICT r7 item 4): NO registered query may
    # plan a single-partition exchange — every global rank/cumsum/top-K
    # routes through _global_rank/_global_cumsum/_topk_ranked, and 1-row
    # aggregates ride broadcasts. Checked on the already-built frame, so
    # the sweep costs one explain per query, not a second build.
    plan = formatted_plan(qdf)
    assert "Exchange SinglePartition" not in plan, (
        f"{name}: single-partition exchange in plan"
    )
    # Second global invariant (round-8 audit: 0 hits across all 322):
    # a non-broadcast cartesian is always an accident here — intentional
    # crosses (1-row/bounded aggregates, join_cross itself) broadcast and
    # plan as BroadcastNestedLoopJoin, never CartesianProduct.
    assert "CartesianProduct" not in plan, (
        f"{name}: non-broadcast cartesian product in plan"
    )
    sdf = qdf.toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract: must at least execute
        return
    ddf = duck.execute(ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    for c in sdf.columns:
        assert str(sdf[c].dtype) == str(ddf[c].dtype), (
            f"dtype mismatch on {c}: spark={sdf[c].dtype} duck={ddf[c].dtype}"
        )
    assert len(sdf) == len(ddf)
    a, b = canon(sdf), canon(ddf)
    mismatches = [(x, y) for x, y in zip(a, b) if repr(x) != repr(y)]
    assert not mismatches, f"{len(mismatches)} mismatched rows, first: {mismatches[0]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"window_start", "event_type", "n_events", "sum_k"}
