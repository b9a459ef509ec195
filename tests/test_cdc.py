"""CDC/merge behavior tests: MERGE semantics (latest-wins, tombstones),
SCD2 interval chaining laws, and the partial-aggregation plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators.cdc import QUERIES, _OPEN_END
from dataflow_pubsub_message_encryption_spark.sources import load_events


def test_upsert_latest_merge_semantics(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    # python-side referee: latest by (ts, event_id), drop error-last users
    rows = ev.select("user_id", "event_id", "ts", "event_type").collect()
    latest: dict[int, tuple] = {}
    counts: dict[int, int] = {}
    for r in rows:
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
        k = (r.ts, r.event_id)
        if r.user_id not in latest or k > latest[r.user_id][0]:
            latest[r.user_id] = (k, r.event_type)
    expect = {
        u: (t, counts[u]) for u, (_, t) in latest.items() if t != "error"
    }
    got = {
        r.user_id: (r.last_event_type, r.n_versions)
        for r in QUERIES["cdc_upsert_latest"](spark, sf_dir).collect()
    }
    assert got == expect
    # tombstoned users really are gone
    dropped = set(counts) - set(expect)
    assert all(latest[u][1] == "error" for u in dropped)


def test_upsert_latest_partial_aggregates(spark, sf_dir):
    plan = (
        QUERIES["cdc_upsert_latest"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # max_by compiles to hash aggregation with a map-side partial pass —
    # the scale property the operator is built on (shuffle keys, not log)
    assert "partial_max_by" in plan or "partial_maxby" in plan.lower()


def test_scd2_interval_chaining(spark, sf_dir):
    out = QUERIES["cdc_scd2_intervals"](spark, sf_dir).collect()
    ev_n = load_events(spark, sf_dir).count()
    # every change-log event becomes exactly one version row
    assert len(out) == ev_n
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
        assert r.valid_from < r.valid_to  # half-open, never empty/inverted
    for u, versions in by_user.items():
        versions.sort(key=lambda r: r.valid_from)
        # exactly one open current version per user, and it is the last
        currents = [r for r in versions if r.is_current]
        assert len(currents) == 1
        assert versions[-1].is_current and versions[-1].valid_to == _OPEN_END
        # intervals chain: each version ends where the next begins
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from
