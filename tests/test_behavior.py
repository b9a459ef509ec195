"""Behavioral-operator tests: python referee for the ordered funnel,
retention matrix laws (week-0 completeness, monotone cohort coverage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators.behavior import QUERIES
from dataflow_pubsub_message_encryption_spark.sources import load_events


def test_funnel_matches_python_referee(spark, sf_dir):
    rows = (
        load_events(spark, sf_dir)
        .select("user_id", "event_type", "ts")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    n_s = n_c = n_p = 0
    for evs in by_user.values():
        s = min((t for t, k in evs if k == "signup"), default=None)
        if s is None:
            continue
        n_s += 1
        c = min((t for t, k in evs if k == "click" and t > s), default=None)
        if c is None:
            continue
        n_c += 1
        p = min((t for t, k in evs if k == "purchase" and t > c), default=None)
        if p is not None:
            n_p += 1
    got = QUERIES["funnel_conversion"](spark, sf_dir).collect()[0]
    assert (got.n_signup, got.n_click_after_signup, got.n_purchase_after_click) == (
        n_s,
        n_c,
        n_p,
    )
    # funnel monotonicity: each stage can only lose users
    assert n_s >= n_c >= n_p


def test_gapfill_dense_grid_and_conservation(spark, sf_dir):
    out = QUERIES["window_gapfill_counts"](spark, sf_dir).collect()
    ev = load_events(spark, sf_dir)
    # conservation: zero-filling adds cells, never counts
    assert sum(r.cnt for r in out) == ev.count()
    types = {r.event_type for r in out}
    hours = sorted({r.window_start for r in out})
    # dense: every (hour, type) cell present exactly once
    assert len(out) == len(hours) * len(types)
    from datetime import datetime, timedelta

    fmt = "%Y-%m-%d %H:%M:%S.%f"
    lo, hi = datetime.strptime(hours[0], fmt), datetime.strptime(hours[-1], fmt)
    assert len(hours) == int((hi - lo) / timedelta(hours=1)) + 1
    # the fixture stream has at least one silent (hour, type) cell
    assert any(r.cnt == 0 for r in out)


def test_retention_cohort_laws(spark, sf_dir):
    out = QUERIES["retention_cohorts"](spark, sf_dir).collect()
    ev = load_events(spark, sf_dir)
    n_users = ev.select("user_id").distinct().count()
    # week 0 across cohorts covers every user exactly once (everyone is
    # active in their own first week by definition)
    week0 = sum(r.n_active_users for r in out if r.week_offset == 0)
    assert week0 == n_users
    for r in out:
        assert r.week_offset >= 0
        assert r.n_active_users >= 1
    # no (cohort, offset) cell can exceed its cohort's week-0 population
    pop = {
        r.cohort_day: r.n_active_users for r in out if r.week_offset == 0
    }
    for r in out:
        assert r.n_active_users <= pop[r.cohort_day]


def test_transition_matrix_rows_normalize(spark, sf_dir):
    from dataflow_pubsub_message_encryption_spark.operators.behavior import QUERIES as BQ
    from collections import defaultdict

    rows = BQ["events_transition_matrix"](spark, sf_dir).collect()
    assert rows
    by_prev = defaultdict(float)
    cnt = defaultdict(int)
    for r in rows:
        assert r.n >= 1 and 0.0 < r.p <= 1.0
        by_prev[r.prev_type] += r.p
        cnt[r.prev_type] += 1
    for prev, total in by_prev.items():
        # each p rounded to 6dp -> row sums to 1 within #cells * 5e-7
        assert abs(total - 1.0) <= cnt[prev] * 5e-7


def test_pattern_match_mega_user_cap(spark, sf_dir):
    """The per-user sequence cap truncates a synthetic bot user to the
    first ``cap`` events in (ts, event_id) order, and on the fixture
    corpus (every user far below _SEQ_CAP) the capped operator is
    output-identical to the registered uncapped-on-fixtures result."""
    from pyspark.sql import functions as F

    from dataflow_pubsub_message_encryption_spark.operators.behavior import (
        _SEQ_CAP,
        _pattern_match,
        QUERIES as BQ,
    )

    # synthetic: user 1 emits view, 8 clicks, purchase (10 events); user 2
    # a 3-event funnel. cap=5 keeps only user 1's first 5 events.
    rows = [(1, 1000 + i, 100 + i, t, 0.0, "{}")
            for i, t in enumerate(["view"] + ["click"] * 8 + ["purchase"])]
    rows += [(2, 2000 + i, 900 + i, t, 0.0, "{}")
             for i, t in enumerate(["view", "click", "purchase"])]
    ev = spark.createDataFrame(
        rows,
        "user_id BIGINT, ts BIGINT, event_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    got = {r.user_id: r for r in _pattern_match(ev, cap=5).collect()}
    assert got[1].n_events == 5          # truncated from 10
    assert got[1].n_click_funnels == 0   # 'vcccc' has no terminal p
    assert not got[1].error_after_purchase
    assert got[2].n_events == 3
    assert got[2].n_click_funnels == 1   # 'vcp'

    # fixture corpus: cap active vs effectively-uncapped must agree
    from dataflow_pubsub_message_encryption_spark.sources import load_events

    fix = load_events(spark, sf_dir)
    capped = {tuple(r) for r in _pattern_match(fix, cap=_SEQ_CAP).collect()}
    uncapped = {tuple(r) for r in _pattern_match(fix, cap=1 << 40).collect()}
    assert capped == uncapped
    assert capped == {tuple(r) for r in BQ["events_pattern_match"](spark, sf_dir).collect()}


def test_growth_accounting_identities(spark, sf_dir):
    """events_growth_accounting conservation laws: actives(w) = new +
    retained + resurrected equals the directly-counted weekly actives,
    and retained(w) = actives(w-1) - churned(w) for every interior
    week."""
    from pyspark.sql import functions as F

    from dataflow_pubsub_message_encryption_spark.operators.behavior import (
        QUERIES as BQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load_events

    rows = {r.week: r for r in BQ["events_growth_accounting"](spark, sf_dir).collect()}
    assert rows
    actives = {
        r.week: r.n
        for r in load_events(spark, sf_dir)
        .select(
            "user_id",
            F.floor(
                F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / 7
            ).cast("long").alias("week"),
        )
        .distinct()
        .groupBy("week")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for w, r in rows.items():
        assert r.n_new + r.n_retained + r.n_resurrected == actives[w]
        if w - 1 in rows:
            assert r.n_retained == actives[w - 1] - r.n_churned
