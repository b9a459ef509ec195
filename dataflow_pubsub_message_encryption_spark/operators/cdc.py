"""Change-data-capture / merge operators: upsert-latest and SCD2 history.

The reference's delivery model is at-least-once Pub/Sub (SURVEY §2 R11), so
any consumer materializing state from its stream is, in effect, applying a
change log. This module makes that capability first-class the way warehouse
engines do: MERGE-style latest-wins upsert with delete tombstones, and
slowly-changing-dimension (type 2) validity intervals. Both treat `events`
as the change log: each event is an upsert of that user's state; an
``error`` event is the delete tombstone.

Scale notes (100 TB):
- Both ops are one window/aggregation shuffle on the merge key (user_id) —
  the same shape a warehouse MERGE compiles to (co-partition log with base
  on the key). No driver-side state, no collect.
- Latest-wins uses max_by (JVM-side, partial-aggregating) instead of a
  row_number window: it combines map-side, so the shuffle carries one
  candidate row per (partition, key), not the whole change log — at 100 TB
  that is the difference between shuffling the log and shuffling the keys.
- SCD2 needs the full per-key ordered history (lead over the partition) —
  inherently a window; skewed keys (a bot user with millions of events)
  would serialize, the documented mitigation is range-partitioning the
  window on (user_id, coarse time bucket) and stitching bucket boundaries.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.normalize import dec4, duck_ts, money, ts_str
from ..sources import load_events
from .base import make_registry

QUERIES, ORACLES, query = make_registry()

_OPEN_END = "9999-12-31 00:00:00.000000"


@query(
    "cdc_upsert_latest",
    f"""
    SELECT user_id, event_type AS last_event_type,
           CAST(round(CAST(value AS DECIMAL(18,4)), 2) AS DOUBLE) AS last_value,
           {duck_ts('ts')} AS last_ts,
           CAST(n_versions AS BIGINT) AS n_versions
    FROM (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_versions
      FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_upsert_latest(spark, sf_dir):
    """MERGE-style latest-wins upsert: collapse the change log to one
    current row per user — the newest event by (ts, event_id) — and drop
    users whose final event is the ``error`` tombstone (a delete that
    arrives after every update deletes the row; one arriving before a
    later update is superseded, exactly MERGE semantics). Implemented
    with ``max_by`` keyed on the (ts, event_id) struct rather than a
    row_number window: max_by partial-aggregates map-side, so only one
    candidate per key per map partition reaches the shuffle. The
    (ts, event_id) ordering struct is totally ordered (event_id unique),
    so the winner is deterministic in both engines."""
    ev = load_events(spark, sf_dir)
    ordk = F.struct("ts", "event_id")
    merged = (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_type", ordk).alias("last_event_type"),
            F.max_by(dec4("value"), ordk).alias("last_value_dec"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_versions"),
        )
        .filter(F.col("last_event_type") != "error")
    )
    return merged.select(
        "user_id",
        "last_event_type",
        money("last_value_dec").alias("last_value"),
        ts_str("last_ts").alias("last_ts"),
        "n_versions",
    )


@query(
    "cdc_scd2_intervals",
    f"""
    SELECT user_id, event_id, event_type,
           {duck_ts('ts')} AS valid_from,
           COALESCE({duck_ts("lead(ts) OVER w")}, '{_OPEN_END}') AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def cdc_scd2_intervals(spark, sf_dir):
    """SCD type-2 historization: each change-log event becomes a version
    row with a [valid_from, valid_to) interval — valid_to is the next
    version's timestamp (lead over the per-user ordered history) and the
    open current version carries the sentinel end + is_current flag. This
    is the standard warehouse dimension-history build, done as one window
    pass instead of a self-join. Timestamps leave as formatted strings
    (NTZ, 6-digit micros) so both engines agree byte-for-byte."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        ts_str("ts").alias("valid_from"),
        F.coalesce(ts_str(nxt), F.lit(_OPEN_END)).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "join_point_in_time_scd2",
    f"""
    WITH dim AS (
      SELECT user_id, event_id AS state_event_id, event_type AS state_type,
             ts AS vf,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      FROM events WHERE event_type <> 'purchase'
    ),
    f AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id,
           {duck_ts('f.ts')} AS purchase_ts,
           CAST(round(CAST(f.value AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS purchase_value,
           d.state_event_id,
           d.state_type,
           {duck_ts('d.vf')} AS state_since
    FROM f LEFT JOIN dim d
      ON d.user_id = f.user_id AND d.vf <= f.ts
         AND (f.ts < d.vt OR d.vt IS NULL)
    """,
)
def join_point_in_time_scd2(spark, sf_dir):
    """Point-in-time (PIT) join against SCD2 validity intervals — the
    warehouse/feature-store lookup the SCD2 build exists FOR: every
    purchase fact picks up the dimension version (here: the user's most
    recent non-purchase state event) that was valid AT the purchase
    timestamp, via interval containment ``valid_from <= ts < valid_to``
    with the open current version matching everything after its start.
    LEFT semantics: a purchase before the user's first state version
    survives with NULL state (PIT joins must never lose facts — the
    training-data corollary is no feature leakage from the future, which
    the containment predicate enforces by construction).

    Versions partition each user's timeline, so join multiplicity is ≤ 1
    per fact — same-timestamp version pairs yield an empty [t, t)
    interval for the superseded row in BOTH engines, keeping the winner
    deterministic. Scale: user_id equality drives the shuffle (ordinary
    equi-join); the containment residual filters in-place. The per-user
    ``lead`` window parallelizes across keys; a bot-user hot key falls to
    the documented SCD2 mitigation (time-bucketed window + boundary
    stitch)."""
    ev = load_events(spark, sf_dir)
    dim = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            F.col("user_id").alias("d_user"),
            F.col("event_id").alias("state_event_id"),
            F.col("event_type").alias("state_type"),
            F.col("ts").alias("vf"),
        )
        .withColumn(
            "vt", F.lead("vf").over(
                Window.partitionBy("d_user").orderBy("vf", "state_event_id")
            )
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase")
    j = facts.join(
        dim,
        (F.col("d_user") == F.col("user_id"))
        & (F.col("vf") <= F.col("ts"))
        & ((F.col("ts") < F.col("vt")) | F.col("vt").isNull()),
        "left",
    )
    return j.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("purchase_ts"),
        money(dec4("value")).alias("purchase_value"),
        "state_event_id",
        "state_type",
        ts_str("vf").alias("state_since"),
    )


_AS_OF = "2024-01-15"  # mid-span snapshot instant (fixture covers Jan 1-30)


@query(
    "scd2_as_of_snapshot",
    f"""
    WITH v AS (
      SELECT user_id, event_id, event_type, ts AS vf,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      FROM events
    )
    SELECT user_id,
           event_id AS state_event_id,
           event_type AS state_type,
           {duck_ts('vf')} AS since,
           (SELECT CAST(count(*) AS BIGINT) FROM v v2
            WHERE v2.user_id = v.user_id
              AND v2.vf <= TIMESTAMP '{_AS_OF}') AS n_prior_versions
    FROM v
    WHERE vf <= TIMESTAMP '{_AS_OF}'
      AND (vt > TIMESTAMP '{_AS_OF}' OR vt IS NULL)
    """,
)
def scd2_as_of_snapshot(spark, sf_dir):
    """Dimension time travel: reconstruct every user's state AS OF a past
    instant from the SCD2 validity intervals — the snapshot complement of
    ``join_point_in_time_scd2`` (that one answers per-FACT lookups; this
    one answers 'what did the whole dimension look like on Jan 15', the
    query behind backfills, audits and reproducible feature snapshots).
    Selection is pure interval containment ``vf <= T < vt`` with the open
    current version matching; exactly one row per user with any history
    before T (versions partition each user's timeline), plus the
    version-count census up to T. One per-user ``lead`` window (parallel
    across keys) + a containment filter — at scale this prunes to the
    partitions overlapping T if the version table is date-partitioned.
    The correlated census subquery decorrelates to a per-user aggregate
    join (same Q17 shape Catalyst handles in agg_correlated_subquery)."""
    ev = load_events(spark, sf_dir)
    T = F.lit(_AS_OF).cast("timestamp_ntz")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("vf"),
        F.lead("ts").over(w).alias("vt"),
    )
    prior = (
        v.filter(F.col("vf") <= T)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_prior_versions"))
    )
    snap = v.filter(
        (F.col("vf") <= T) & ((F.col("vt") > T) | F.col("vt").isNull())
    )
    return snap.join(prior, "user_id").select(
        "user_id",
        F.col("event_id").alias("state_event_id"),
        F.col("event_type").alias("state_type"),
        ts_str("vf").alias("since"),
        F.col("n_prior_versions").cast("long"),
    )
