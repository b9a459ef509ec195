"""Scale-pattern operators: the shuffle-level techniques a 1000-executor
cluster needs, each proven RESULT-IDENTICAL to the naive plan by an EXACT
DuckDB oracle.

The reference has no distributed-shuffle layer at all [U/H, SURVEY §2.1 —
a linear Beam pipeline; Dataflow owns its physical execution]; these rows
make the engine's 100 TB story *checkable* instead of narrative. Each
operator implements a well-known scale mitigation (skew salting, space-
filling-curve layout clustering, Arrow grouped-map) whose OUTPUT must be
bit-identical to the unmitigated query — which is exactly what the oracle
gate asserts. SCALING.md §8 referenced these as design notes; here they
are executable.

Scale notes (100 TB):
- ``join_skew_salted``: a hot key (one event_type = 40 % of the fact
  table) serializes the naive shuffle through one reducer. Salting
  splits each key across ``_N_SALT`` reducers (fact side: deterministic
  ``pmod(event_id, N)``; dim side: replicate ×N) and re-merges with a
  second tiny aggregation. The shuffle fan-out is restored to N× and the
  final agg touches |keys|×N rows — negligible. AQE's skew-join handles
  the JOIN case at runtime; explicit salting is still the tool for
  skewed AGGREGATION and for engines/pipelines where AQE can't see the
  skew (first-stage partial aggs hide it).
- ``zorder_cluster``: multi-dimensional clustering for layout. Sorting
  by the interleaved z-value co-locates rows close in BOTH dimensions,
  so min/max parquet footer stats prune 2-D range predicates — the
  standard lakehouse technique for (user, time) point lookups on a
  table sorted by neither. The operator computes the curve and per-
  bucket extents; a writer would ``repartitionByRange(zval)`` +
  ``sortWithinPartitions(zval)`` on the way out.
- ``grouped_map_scale``: ``applyInPandas`` is THE escape hatch for
  per-group logic Spark expressions can't say. Cost model: one full
  shuffle on the group key + Arrow serialization both ways; each group
  must fit in one worker's memory (per-lang corpora here; at 100 TB the
  group key must be finer or the logic two-pass). Kept exact-checkable
  by doing only deterministic int/double arithmetic inside the UDF.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.normalize import dec4, money, sim, ts_str
from ..materialize import pin
from ..sources import load, load_events
from .base import make_registry

QUERIES, ORACLES, query = make_registry()

_N_SALT = 8


@query(
    "join_skew_salted",
    """
    WITH dim AS (
      SELECT DISTINCT event_type, substr(event_type, 1, 1) AS category
      FROM events
    )
    SELECT d.category,
           e.event_type,
           count(*) AS n_events,
           CAST(round(SUM(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY d.category, e.event_type
    """,
)
def join_skew_salted(spark, sf_dir):
    """Skew-salted join + aggregation, result-identical to the naive
    plan (the oracle runs the UNSALTED query). Fact side gets a
    deterministic salt ``pmod(event_id, N)``; the dim side is replicated
    ×N via ``explode(sequence(0, N-1))`` so the equi-join key becomes
    (event_type, salt) — a hot event_type now spreads over N reducers
    instead of one. A first aggregation on (category, event_type, salt)
    does the heavy lifting at N× parallelism; the second merges N
    partials per key. Decimal sums keep the two-stage total bit-equal
    to the one-stage oracle sum."""
    ev = load_events(spark, sf_dir)
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("category", F.substring("event_type", 1, 1))
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1)))
    )
    fact = ev.select(
        "event_type",
        F.pmod("event_id", F.lit(_N_SALT)).cast("int").alias("salt"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    partial = (
        fact.join(F.broadcast(dim_salted), ["event_type", "salt"])
        .groupBy("category", "event_type", "salt")
        .agg(F.count("*").alias("pn"), F.sum("v").alias("pv"))
    )
    return partial.groupBy("category", "event_type").agg(
        F.sum("pn").alias("n_events"),
        money(F.sum("pv")).alias("total_value"),
    )


def _zbits(col: F.Column, offset: int) -> F.Column:
    """Spread the low 4 bits of ``col`` onto even (offset=0) or odd
    (offset=1) positions of an 8-bit z-value."""
    z = F.lit(0)
    for i in range(4):
        bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(bit, 2 * i + offset)
    return z


def _zbits_sql(expr: str, offset: int) -> str:
    # Each shift term gets its own parens: SQL gives ``+`` tighter binding
    # than ``<<``, so ``a << 1 + b`` would parse as ``a << (1 + b)``.
    return " + ".join(
        f"(((({expr}) >> {i}) & 1) << {2 * i + offset})" for i in range(4)
    )


@query(
    "zorder_cluster",
    f"""
    WITH z AS (
      SELECT ({_zbits_sql("user_id % 16", 1)})
           + ({_zbits_sql("CAST(floor(hour(ts) / 2) AS BIGINT)", 0)}) AS zval,
             user_id
      FROM events
    )
    SELECT CAST(zval >> 4 AS INTEGER) AS z_bucket,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(zval) AS INTEGER) AS z_min,
           CAST(max(zval) AS INTEGER) AS z_max
    FROM z GROUP BY 1
    """,
)
def zorder_cluster(spark, sf_dir):
    """Z-order (Morton) curve over (user bucket, hour-of-day): interleave
    4 bits of ``pmod(user_id,16)`` with 4 bits of ``hour/2`` into an
    8-bit z-value, then report per-z-range extents. Pure bit arithmetic
    (shiftleft/shiftright/&) — JVM codegen, no UDF, and the identical
    operators exist in DuckDB so the curve itself is oracle-checked.
    The bucket histogram is what a layout optimizer inspects before
    choosing ``repartitionByRange(zval).sortWithinPartitions(zval)`` for
    the write: rows sharing a bucket are close in both dimensions, so
    footer min/max stats prune 2-D range scans."""
    ev = load_events(spark, sf_dir)
    zval = (
        _zbits(F.pmod("user_id", F.lit(16)), 1)
        + _zbits(F.floor(F.hour("ts") / 2).cast("bigint"), 0)
    ).alias("zval")
    return (
        ev.select(zval, "user_id")
        .groupBy(F.shiftright("zval", 4).cast("int").alias("z_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.min("zval").cast("int").alias("z_min"),
            F.max("zval").cast("int").alias("z_max"),
        )
    )


@query(
    "grouped_map_scale",
    """
    SELECT doc_id, lang,
           round(CASE WHEN mx = mn THEN 0.0
                      ELSE CAST(n_chars - mn AS DOUBLE) / (mx - mn) END,
                 6) AS scaled
    FROM (
      SELECT doc_id, lang, n_chars,
             min(n_chars) OVER (PARTITION BY lang) AS mn,
             max(n_chars) OVER (PARTITION BY lang) AS mx
      FROM documents
    )
    """,
)
def grouped_map_scale(spark, sf_dir):
    """Per-group min-max normalization via ``applyInPandas`` — the
    grouped-map Arrow path (full shuffle on the group key, whole group
    as one pandas frame). The UDF body is deterministic int/double
    arithmetic ((x−min)/(max−min) over exact int64s), so the Arrow
    round-trip is bit-identical to the window-function oracle — proving
    the grouped-map plumbing itself is loss-free. Rounding happens
    JVM-side AFTER the UDF (same ``round(x, 6)`` both engines). At
    100 TB the per-group frame must fit one worker — fine for per-lang
    stats; finer keys or a two-pass (agg then broadcast join) otherwise,
    which is exactly what this op's window-function oracle would be."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["n_chars"].min(), pdf["n_chars"].max()
        rng = mx - mn
        scaled = (
            (pdf["n_chars"] - mn) / rng if rng else pdf["n_chars"] * 0.0
        )
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "scaled": scaled.astype("float64"),
            }
        )

    out = docs.groupBy("lang").applyInPandas(
        scale, "doc_id long, lang string, scaled double"
    )
    return out.select("doc_id", "lang", sim("scaled").alias("scaled"))


@query(
    "join_range_binned",
    """
    SELECT strftime(CAST(date_trunc('hour', c.ts) AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S.%f') AS click_hour,
           count(*) AS n_pairs,
           CAST(count(DISTINCT c.event_id) AS BIGINT) AS n_clicks
    FROM events c JOIN events e
      ON c.event_type = 'click' AND e.event_type = 'error'
     AND e.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts + INTERVAL 1 HOUR
    GROUP BY 1
    """,
)
def join_range_binned(spark, sf_dir):
    """Interval join via BUCKET BINNING, result-identical to the naive
    theta join (which is what the oracle runs): clicks paired with error
    events within ±1 h. A bare |t_c − t_e| ≤ 1h predicate gives Spark a
    nested-loop join — quadratic and unshuffleable. The scale rewrite:
    bin both sides to 1-h buckets, EXPLODE the error side to its 3
    admissible buckets (b−1, b, b+1), equi-join on the bucket, then
    verify the exact predicate. Each pair matches in exactly ONE bucket
    (the click's), so emit-once holds with no post-hoc distinct — the
    same discipline as the MinHash band join. The equi-key restores
    hash-partitioned parallelism; candidate volume is Σ per-bucket
    |clicks|·|errors| — controlled by the bin width, which should match
    the range radius."""
    ev = load_events(spark, sf_dir)
    us = F.expr("unix_micros(to_utc_timestamp(ts, 'UTC'))")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
        F.floor(us / 3_600_000_000).alias("bucket"),
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("ts").alias("e_ts"),
            F.floor(us / 3_600_000_000).alias("eb"),
        )
        .withColumn("bucket", F.explode(F.expr("array(eb - 1, eb, eb + 1)")))
    )
    diff = F.expr("timestampdiff(MICROSECOND, c_ts, e_ts)")
    pairs = clicks.join(errors, "bucket").filter(
        (diff >= -3_600_000_000) & (diff <= 3_600_000_000)
    )
    return pairs.groupBy(
        ts_str(F.date_trunc("hour", "c_ts")).alias("click_hour")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("c_id").alias("n_clicks"),
    )


@query(
    "agg_hll_partitioned_union",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_ok
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT), TRUE FROM events
    """,
)
def agg_hll_partitioned_union(spark, sf_dir):
    """Mergeable-sketch distinct counting — THE scale pattern exact
    ``count_distinct`` cannot follow: per-group HLL sketches
    (``hll_sketch_agg``, lgConfigK=14 → ~0.8 % std error) are unioned
    into a global estimate (``hll_union_agg``) WITHOUT re-scanning the
    fact table. At 100 TB this is how daily uniques roll into monthly
    uniques: store one 16 KB sketch per (group, day) partition, merge on
    demand; exact distinct would re-shuffle the raw keys every time.
    Oracle pattern (as ``agg_approx_distinct``): the query emits the
    EXACT count plus a Spark-computed within-5 % boolean for both the
    per-group estimates and the merged global one; DuckDB recomputes the
    exact counts and literal TRUE — a genuine cross-engine error-bound
    check on the sketch AND its merge."""
    ev = load_events(spark, sf_dir).select("event_type", "user_id")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    ok = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    )
    per_out = per.select("event_type", "exact_users", ok.alias("hll_ok"))
    merged = per.agg(F.hll_union_agg("sk").alias("gsk"))
    exact_g = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    g_ok = (
        F.abs(F.hll_sketch_estimate("gsk") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    )
    g_out = merged.crossJoin(exact_g).select(  # 1 row × 1 row
        F.lit("ALL").alias("event_type"), "exact_users", g_ok.alias("hll_ok")
    )
    return per_out.unionByName(g_out)


_N_GRID = 128  # equi-depth summary resolution: 129 grid points per group


@query(
    "agg_quantile_sketch_union",
    """
    SELECT l_returnflag AS scope,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_exact,
           TRUE AS q_ok
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL', round(quantile_cont(l_extendedprice, 0.5), 6),
           round(quantile_cont(l_extendedprice, 0.9), 6), TRUE
    FROM lineitem
    """,
)
def agg_quantile_sketch_union(spark, sf_dir):
    """Mergeable QUANTILE summaries — the order-statistics analog of
    ``agg_hll_partitioned_union``: per-group percentile sketches reduce to
    a (grid, weight) summary, and the GLOBAL quantile estimate is computed
    by merging only those summaries — the fact table is never re-scanned
    for the merged estimate. At 100 TB this is how per-day latency
    quantiles roll into monthly ones: store a ~1 KB equi-spaced quantile
    grid + row count per (group, day), merge on demand.

    Mechanics: each group emits ``percentile_approx`` at 129 equi-spaced
    ranks (an equi-depth histogram; every point carries weight n/129) plus
    its row count. The merge explodes the grids into weighted points and
    takes the weighted rank-0.5/0.9 value — a window-cumsum over G x 129
    rows, negligible beside the one pass that built the summaries.

    Oracle pattern (as the HLL twin): both engines emit the EXACT
    per-group and global percentiles; Spark adds booleans asserting the
    per-group sketch is within 1 % and the grid-merged global estimate
    within 5 % of exact (grid rank error <= 1/256 of total mass plus
    sketch error; 5 % in value space is comfortable for this
    distribution). DuckDB emits literal TRUE — a drifting sketch or a
    wrong merge flips the boolean and fails the hash gate."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    qs = F.array(*[F.lit(i / _N_GRID) for i in range(_N_GRID + 1)])
    ex50 = F.percentile("l_extendedprice", F.lit(0.5))
    ex90 = F.percentile("l_extendedprice", F.lit(0.9))
    apx50 = F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    apx90 = F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(10000))
    per = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", qs, F.lit(10000)).alias("grid"),
        F.count("*").alias("n"),
        F.round(ex50, 6).alias("p50_exact"),
        F.round(ex90, 6).alias("p90_exact"),
        (
            (F.abs(apx50 - ex50) / ex50 <= 0.01)
            & (F.abs(apx90 - ex90) / ex90 <= 0.01)
        ).alias("q_ok"),
    )
    per_out = per.select(
        F.col("l_returnflag").alias("scope"), "p50_exact", "p90_exact", "q_ok"
    )

    # ---- merge stage: ONLY the (grid, n) summaries are touched below ----
    points = per.select(
        "l_returnflag",
        (F.col("n").cast("double") / (_N_GRID + 1)).alias("w"),
        F.posexplode("grid").alias("pos", "x"),
    )
    cum = points.withColumn(
        "cumw",
        F.sum("w").over(
            Window.orderBy("x", "l_returnflag", "pos").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    tot = points.agg(F.sum("w").alias("totw"))  # == total row count
    est = cum.crossJoin(tot).agg(  # G x 129 rows x 1 — merge-stage only
        F.min(F.when(F.col("cumw") >= 0.5 * F.col("totw"), F.col("x"))).alias(
            "est50"
        ),
        F.min(F.when(F.col("cumw") >= 0.9 * F.col("totw"), F.col("x"))).alias(
            "est90"
        ),
    )
    exact_g = li.agg(
        F.round(ex50, 6).alias("p50_exact"), F.round(ex90, 6).alias("p90_exact")
    )
    g_out = est.crossJoin(exact_g).select(  # 1 row x 1 row
        F.lit("ALL").alias("scope"),
        "p50_exact",
        "p90_exact",
        (
            (F.abs(F.col("est50") - F.col("p50_exact")) / F.col("p50_exact") <= 0.05)
            & (F.abs(F.col("est90") - F.col("p90_exact")) / F.col("p90_exact") <= 0.05)
        ).alias("q_ok"),
    )
    return per_out.unionByName(g_out)


_N_BUCKETS = 8


@query(
    "join_bucketed_colocated",
    """
    SELECT o.o_orderstatus,
           count(*) AS n_items,
           CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Bucketed co-located join — the storage-level shuffle eliminator
    SCALING.md's bucketing notes describe, made executable: both fact
    tables are written ``bucketBy(8, orderkey)`` + ``sortBy`` as managed
    parquet tables, and the subsequent join reads bucket b of one table
    against bucket b of the other — NO exchange on either side of the
    SortMergeJoin (asserted in tests/test_plans.py); the only shuffle in
    the plan is the final tiny per-status aggregate. This is the pattern
    for a fact-fact join that repeats across a pipeline: pay the
    partitioning once at write time, join for free forever after. At
    100 TB the bucket count is sized so bucket x table fits an executor
    core (e.g. 4096), and both tables MUST agree on count and key.
    Result-identical to the plain shuffle join, which is what the oracle
    (a naive join) checks."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    for name, df, key in (
        ("sg_bucket_orders", orders, "o_orderkey"),
        ("sg_bucket_lineitem", li, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # Local-mode glue: with the in-memory catalog, a managed table
        # written by a PREVIOUS session is no longer in the catalog (so the
        # DROP above is a no-op) but its warehouse directory survives, and
        # saveAsTable refuses to reuse the location. Purge the orphan dir.
        # A persistent metastore (the production case) doesn't hit this —
        # DROP TABLE removes the location too.
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
        shutil.rmtree(f"{wh.path or wh.geturl()}/{name}", ignore_errors=True)
        (
            df.write.format("parquet")
            .bucketBy(_N_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    o = spark.table("sg_bucket_orders")
    l = spark.table("sg_bucket_lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            money(F.sum(dec4("l_extendedprice"))).alias("revenue"),
        )
    )


_IVM_SPLIT = "2024-01-20"  # base/delta boundary for the incremental merge


@query(
    "agg_incremental_merge",
    f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events GROUP BY event_type
    """,
)
def agg_incremental_merge(spark, sf_dir):
    """Incremental view maintenance — the aggregate-state merge law made
    checkable: a 'materialized' aggregate over the base period (ts <
    {split}) is combined with the delta period's aggregate by merging
    PARTIAL STATES (counts add, decimal sums add) — the base raw data is
    never rescanned at refresh time. This is how a 100 TB rollup table
    stays current: refresh cost ∝ delta, not history; it works exactly
    for any commutative-monoid aggregate (count/sum/min/max, and the
    sketch family — see agg_hll_partitioned_union / agg_quantile_
    sketch_union for the approximate analogs). The oracle computes the
    full-scan aggregate, so the gate asserts merge(base, delta) ==
    recompute(all) value-for-value. Non-decomposable aggregates (exact
    median, count-distinct) are precisely the ones that CAN'T refresh
    this way — they need the sketch route."""
    ev = load_events(spark, sf_dir).select("event_type", "ts", dec4("value").alias("v"))
    split = F.lit(_IVM_SPLIT).cast("timestamp_ntz")

    def part(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        )

    base = part(ev.filter(F.col("ts") < split))
    delta = part(ev.filter(F.col("ts") >= split))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), money(F.sum("s")).alias("total_value"))
    )


@query(
    "topk_per_group_twolevel",
    f"""
    SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY sha256(text), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
)
def topk_per_group_twolevel(spark, sf_dir):
    """Two-level per-group top-K — the scale path ``sample_stratified``'s
    docstring promises, made executable and proven result-identical (the
    oracle runs the single-window form). A mega-stratum serializes a
    single ranking window through one task; instead, level 1 ranks within
    (lang, salt) — ``_N_SALT``x the parallelism, state bounded by K per
    salted partition — and keeps only each sub-partition's top K; level 2
    re-ranks the surviving ``K x _N_SALT`` rows per stratum. Identical
    output because min-K of a union is the min-K of the per-part min-Ks
    (any row outside its sub-partition's top K is beaten by K rows in its
    OWN sub-partition, so it can never enter the global top K). Ordering
    key (content hash, doc_id tie-break) is total, so ranks are stable in
    both engines."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.sha2("text", 256).alias("h")
    )
    lvl1 = Window.partitionBy(
        "lang", F.pmod("doc_id", F.lit(_N_SALT))
    ).orderBy("h", "doc_id")
    survivors = (
        docs.withColumn("rk1", F.row_number().over(lvl1))
        .filter(F.col("rk1") <= 5)
        .drop("rk1")
    )
    lvl2 = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(lvl2))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "lang", "rk")
    )


@query(
    "profile_key_skew",
    """
    WITH c AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM c
    )
    SELECT user_id AS key, CAST(cnt AS BIGINT) AS cnt,
           CAST(rk AS INTEGER) AS rk,
           round(CAST(cnt AS DOUBLE) / n_rows, 6) AS share,
           round(CAST(cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_vs_avg
    FROM (
      SELECT user_id, cnt,
             row_number() OVER (ORDER BY cnt DESC, user_id) AS rk
      FROM c
    ), tot
    WHERE rk <= 10
    """,
)
def profile_key_skew(spark, sf_dir):
    """Join/agg-key skew diagnostic — the census a planner (or engineer)
    runs BEFORE choosing salting / AQE-skew-join / broadcast for a key:
    the 10 hottest keys with absolute count, corpus share, and
    skew-vs-average factor (cnt x n_keys / n_rows; 1.0 = perfectly
    uniform). Shape: one partial-aggregating groupBy on the key (shuffle
    ∝ distinct keys), a 1-row totals aggregate joined back by broadcast
    cross join, and a top-10 via TakeOrderedAndProject + K-row rerank
    (`_topk_ranked` — key grain is unbounded, so no global ranking
    window). At 100 TB this is the cheap pre-pass that tells you whether
    dedup_minhash's band join or a fact-dim join needs the
    join_skew_salted treatment."""
    ev = load_events(spark, sf_dir)
    c = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = c.agg(
        F.sum("cnt").alias("n_rows"), F.count("*").alias("n_keys")
    )
    return (
        _topk_ranked(c, 10, F.desc("cnt"), F.col("user_id"))
        .withColumn("rk", F.col("rk").cast("int"))
        .crossJoin(F.broadcast(tot))  # 10 rows x 1 row
        .select(
            F.col("user_id").alias("key"),
            "cnt",
            "rk",
            F.round(F.col("cnt").cast("double") / F.col("n_rows"), 6).alias(
                "share"
            ),
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows"),
                6,
            ).alias("skew_vs_avg"),
        )
    )


@query(
    "agg_exact_median_twopass",
    """
    WITH t AS (SELECT l_extendedprice AS x FROM lineitem),
    n AS (SELECT count(*) AS n FROM t),
    med AS (
      SELECT x AS median_x FROM (
        SELECT x, row_number() OVER (ORDER BY x) AS rn FROM t
      ), n
      WHERE rn = (n + 1) // 2
    )
    SELECT CAST(n.n AS BIGINT) AS n_rows,
           med.median_x AS median_x,
           CAST((SELECT count(*) FROM t
                 WHERE floor(x) = floor(med.median_x)) AS BIGINT)
             AS n_bucket_scanned
    FROM n, med
    """,
)
def agg_exact_median_twopass(spark, sf_dir):
    """EXACT global median (lower median, rank ⌈N/2⌉) without a global
    sort — the two-pass bucket-prune algorithm a 100 TB engine uses when
    ``percentile_approx`` isn't good enough (billing, SLA thresholds):

    pass 1 histograms the column into integer buckets (partial-
    aggregating groupBy, |buckets| rows) and walks the cumulative counts
    to find the bucket containing the target rank; pass 2 re-scans ONLY
    that bucket (predicate pushed to the parquet scan) and takes the
    (rank - preceding) smallest inside it via TakeOrdered — never a
    whole-table sort. The cumulative walk rides ``_global_cumsum``
    (range-partitioned prefix sum): bucket count ∝ value range, so a
    bare ``SUM OVER (ORDER BY b)`` would be the single-partition-window
    trap on a wide-range column — caught in round 9 by a WindowExec
    warning sweep over BUILD-side jobs (the returned-plan sweep can't
    see a window a driver-scalar collect already consumed). Driver
    transfer is two scalars (total count; the located bucket + its
    preceding cumulative count), the same bounded pattern as the
    components fixed-point loop. The oracle computes the same rank with
    a row_number over the full table — the prune is value-checked, not
    trusted."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    n = li.agg(F.count("*")).collect()[0][0]  # driver-scalar
    rank = (n + 1) // 2
    hist = li.groupBy(F.floor("x").alias("b")).agg(F.count("*").alias("c"))
    cum = _global_cumsum(hist, "c", "b").filter(
        F.col("cum") >= rank
    ).orderBy("b").limit(1)
    located = cum.agg(F.min("b").alias("b"), F.min(F.col("cum") - F.col("c")).alias("prev")).collect()[0]  # driver-scalar
    b_star, prev_cum = located["b"], located["prev"]
    k = rank - prev_cum
    in_bucket = li.filter(F.floor("x") == b_star)
    median = (
        in_bucket.orderBy("x").limit(int(k)).agg(F.max("x").alias("median_x"))
    )
    n_bucket = in_bucket.agg(F.count("*").alias("n_bucket_scanned"))
    return (
        median.crossJoin(F.broadcast(n_bucket))  # 1 row x 1 row
        .select(
            F.lit(n).cast("long").alias("n_rows"),
            "median_x",
            "n_bucket_scanned",
        )
    )


_PCTS = (25, 50, 90)


@query(
    "agg_exact_percentiles_twopass",
    f"""
    WITH t AS (SELECT l_extendedprice AS x FROM lineitem),
    n AS (SELECT count(*) AS n FROM t),
    r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM t)
    SELECT (SELECT CAST(n.n AS BIGINT) FROM n) AS n_rows,
           (SELECT x FROM r, n WHERE rn = (n.n * 25 + 99) // 100) AS p25,
           (SELECT x FROM r, n WHERE rn = (n.n * 50 + 99) // 100) AS p50,
           (SELECT x FROM r, n WHERE rn = (n.n * 90 + 99) // 100) AS p90
    """,
)
def agg_exact_percentiles_twopass(spark, sf_dir):
    """EXACT p25/p50/p90 with ONE histogram pass + ONE pruned second
    pass — the multi-rank generalization of ``agg_exact_median_twopass``
    (rank_p = ceil(n*p/100), the lower-value convention, all-integer):
    the shared integer-bucket histogram locates every target rank's
    bucket in a single cumulative walk (``_global_cumsum`` — the
    range-partitioned prefix sum; buckets ∝ value range, so the bare
    global window this op used until round 9 was the single-partition
    trap in a BUILD-side job the returned-plan sweep can't see); the
    second scan filters to the union of located buckets (predicate
    pushed to parquet) and takes each in-bucket order statistic via
    TakeOrdered. Driver transfer is the count plus one located-bucket
    row per percentile — bounded, like the components loop. At 100 TB
    this is how exact SLA/billing percentiles are actually computed: two
    corpus passes, no global sort, no sketch error bar."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    n = li.agg(F.count("*")).collect()[0][0]  # driver-scalar
    ranks = {p: (n * p + 99) // 100 for p in _PCTS}
    hist = li.groupBy(F.floor("x").alias("b")).agg(F.count("*").alias("c"))
    cum = _global_cumsum(hist, "c", "b")
    out = None
    for p in _PCTS:
        rank = ranks[p]
        loc = cum.filter(F.col("cum") >= rank).orderBy("b").limit(1)
        row = loc.agg(F.min("b").alias("b"), F.min(F.col("cum") - F.col("c")).alias("prev")).collect()[0]  # driver-scalar
        k = int(rank - row["prev"])
        val = (
            li.filter(F.floor("x") == row["b"])
            .orderBy("x")
            .limit(k)
            .agg(F.max("x").alias(f"p{p}"))
        )
        out = val if out is None else out.crossJoin(F.broadcast(val))  # 1x1
    return out.select(
        F.lit(n).cast("long").alias("n_rows"),
        *[F.col(f"p{p}") for p in _PCTS],
    )


@query(
    "dedup_exact_hierarchical",
    """
    SELECT sha256(text) AS sha,
           CAST(min(doc_id) AS BIGINT) AS keep_doc,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_hierarchical(spark, sf_dir):
    """Hierarchical exact dedup — the two-level shard-then-global shape a
    multi-datacenter / multi-snapshot 100 TB dedup actually runs: level 1
    resolves each (content-hash, shard) locally (keep the min doc_id,
    count copies) at full shard parallelism; level 2 merges one row per
    (hash, shard) — min-of-mins and sum-of-counts, both associative, so
    the result is PROVABLY the single-level global dedup, which is
    exactly what the oracle computes (the same law family as
    topk_per_group_twolevel and agg_incremental_merge). The level-2
    shuffle carries hashes, never text."""
    docs = load(spark, sf_dir, "documents").select(
        F.sha2("text", 256).alias("sha"),
        "doc_id",
        F.pmod("doc_id", F.lit(8)).alias("shard"),
    )
    l1 = docs.groupBy("sha", "shard").agg(
        F.min("doc_id").alias("pm"), F.count("*").alias("pc")
    )
    return l1.groupBy("sha").agg(
        F.min("pm").alias("keep_doc"), F.sum("pc").alias("n_copies")
    )


_BM_WORD = 62  # bits per bitmap word (positive-range long, sign bit unused)


@query(
    "agg_bitmap_distinct",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(bit_count(bm)) AS BIGINT) AS distinct_users
    FROM (
      SELECT event_type, user_id // {_BM_WORD} AS w,
             bit_or(CAST(1 AS BIGINT)
                    << CAST(user_id % {_BM_WORD} AS INTEGER)) AS bm
      FROM events GROUP BY 1, 2
    )
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT mergeable distinct counting via bitmap words — the
    Doris/ClickHouse/Druid bitmap-index idiom for the case where
    ``approx_count_distinct`` (C15) isn't allowed but a full
    ``count(DISTINCT)`` re-shuffle per query is too expensive: the dense
    integer key space is packed into {_BM_WORD}-bit words
    (word = user_id div {_BM_WORD}, bit = user_id mod {_BM_WORD}), each
    (group, word) cell reduced with the associative+commutative
    ``bit_or`` — so partial aggregation combines map-side and word
    bitmaps MERGE across shards/days exactly like the HLL sketches of
    ``agg_hll_partitioned_union``, but losslessly. The final count is
    ``sum(bit_count(word))`` per group. Shuffle ∝ groups × occupied
    words (each a single long), never the fact rows; at 100 TB the
    per-day word tables are tiny, and unioning a year of them is the
    same one bit_or pass. Both engines run the identical integer
    bit arithmetic, so the oracle is EXACT — and the suite also pins
    distinct_users == count(DISTINCT user_id) per group."""
    ev = load_events(spark, sf_dir)
    bits = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_BM_WORD} AS INT))"
    )
    words = (
        ev.select(
            "event_type",
            # integer DIV, not double-divide-then-cast: exact for the full
            # 63-bit id range (ids are non-negative, so DIV == floor-div
            # == DuckDB's //)
            F.expr(f"user_id DIV {_BM_WORD}").alias("w"),
            bits.alias("b"),
        )
        .groupBy("event_type", "w")
        .agg(F.bit_or("b").alias("bm"))
    )
    return words.groupBy("event_type").agg(
        F.count("*").alias("n_words"),
        F.sum(F.bit_count("bm")).cast("long").alias("distinct_users"),
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 64


def _cms_pos_sql(i: int, key: str) -> str:
    """DuckDB: row i's CMS bucket of `key` (first sha256 byte mod width)."""
    h = f"sha256('{i}:' || {key})"
    return (
        f"((instr('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16"
        f" + (instr('0123456789abcdef', substr({h}, 2, 1)) - 1))"
        f" % {_CMS_WIDTH}"
    )


@query(
    "agg_heavy_hitters_cms",
    f"""
    WITH r AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
    pos AS (
      SELECT i, key, CASE i
               {' '.join(f"WHEN {i} THEN {_cms_pos_sql(i, 'key')}" for i in range(_CMS_DEPTH))}
             END AS p
      FROM r, (VALUES {', '.join(f'({i})' for i in range(_CMS_DEPTH))}) t(i)
    ),
    sketch AS (SELECT i, p, count(*) AS c FROM pos GROUP BY 1, 2),
    exact AS (SELECT key, count(*) AS exact_cnt FROM r GROUP BY 1),
    top10 AS (
      SELECT key, exact_cnt, rk FROM (
        SELECT key, exact_cnt,
               row_number() OVER (ORDER BY exact_cnt DESC, key) AS rk
        FROM exact
      ) WHERE rk <= 10
    ),
    keypos AS (SELECT DISTINCT i, key, p FROM pos),
    est AS (
      SELECT kp.key, min(s.c) AS cms_est
      FROM keypos kp JOIN sketch s ON s.i = kp.i AND s.p = kp.p
      WHERE kp.key IN (SELECT key FROM top10)
      GROUP BY kp.key
    )
    SELECT t.key, CAST(t.rk AS INTEGER) AS rk,
           CAST(t.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(e.cms_est AS BIGINT) AS cms_est,
           CAST(e.cms_est - t.exact_cnt AS BIGINT) AS overestimate
    FROM top10 t JOIN est e ON e.key = t.key
    """,
)
def agg_heavy_hitters_cms(spark, sf_dir):
    """Count-Min-Sketch heavy hitters, self-calibrated: build the
    {_CMS_DEPTH}x{_CMS_WIDTH} counter grid in ONE pass (explode each row
    into {_CMS_DEPTH} (row, bucket) cells -> partial-aggregating groupBy
    over {_CMS_DEPTH * _CMS_WIDTH} cells), then report the top-10 exact
    keys with their CMS point estimate (min over the {_CMS_DEPTH} rows)
    and the overestimate the collisions cost. The sketch is the
    mergeable-summary answer to "what are the hot keys across 100 TB
    WITHOUT shuffling per-key rows": cells add across shards/days like
    the HLL and quantile-grid unions, the grid is {_CMS_DEPTH * _CMS_WIDTH}
    longs total, and estimate >= truth is a structural guarantee (checked
    column: overestimate >= 0, pinned in the suite). Hash rows use the
    engine's portable sha256 hex-nibble idiom so both engines bucket
    identically -> the whole sketch, not just the report, is EXACT.
    The exact side here doubles as the oracle's truth; a production run
    keeps only the sketch + a per-partition candidate set."""
    ev = load_events(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("key")
    )
    rows = []
    for i in range(_CMS_DEPTH):
        h = F.sha2(F.concat(F.lit(f"{i}:"), F.col("key")), 256)
        nib = lambda j: F.instr(F.lit("0123456789abcdef"), F.substring(h, j, 1)) - 1  # noqa: B023,E731
        rows.append(
            F.struct(
                F.lit(i).alias("i"),
                ((nib(1) * 16 + nib(2)) % _CMS_WIDTH).alias("p"),
            )
        )
    cells = ev.select("key", F.explode(F.array(*rows)).alias("ip"))
    sketch = (
        cells.groupBy(F.col("ip.i").alias("i"), F.col("ip.p").alias("p"))
        .agg(F.count("*").alias("c"))
    )
    exact = ev.groupBy("key").agg(F.count("*").alias("exact_cnt"))
    # top-10 hot keys: TakeOrderedAndProject + K-row rerank, never a
    # global ranking window over the unbounded key census
    top10 = _topk_ranked(
        exact, 10, F.desc("exact_cnt"), F.col("key")
    ).withColumn("rk", F.col("rk").cast("int"))
    keypos = cells.select("key", "ip.i", "ip.p").distinct()
    est = (
        F.broadcast(top10)
        .join(keypos, "key")
        .join(F.broadcast(sketch), ["i", "p"])
        .groupBy("key")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        top10.join(F.broadcast(est), "key")
        .select(
            "key",
            "rk",
            "exact_cnt",
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_cnt"))
            .cast("long")
            .alias("overestimate"),
        )
    )


@query(
    "join_partition_pruned_dpp",
    """
    WITH dim AS (
      SELECT DISTINCT event_type FROM events
      WHERE event_type LIKE 'p%' OR event_type = 'error'
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(SUM(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def join_partition_pruned_dpp(spark, sf_dir):
    """Dynamic partition pruning — the scan-eliminating join Catalyst
    runs when a fact table is PARTITIONED on the join key and the dim
    side carries a runtime-only filter: the fact is written once
    ``partitionBy(event_type)`` (the write-time layout decision, same
    family as ``join_bucketed_colocated``), the dim is a runtime-derived
    selective type list (LIKE 'p%' OR 'error' -> 2 of 5 partitions; NOT
    constant-foldable, so static pruning can't see it), and Catalyst
    injects a ``dynamicpruning`` subquery into the fact scan so 3 of the
    5 partition directories are never opened (plan-asserted in
    tests/test_plans.py). At 100 TB with date-partitioned facts this is
    THE difference between scanning a year and scanning a week: the
    pruning cost is one broadcast of the dim's key set. Result-identical
    to the unpartitioned join, which is what the oracle computes."""
    import shutil
    from urllib.parse import urlparse

    name = "sg_part_events"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{wh.path or wh.geturl()}/{name}", ignore_errors=True)
    ev = load_events(spark, sf_dir).select("event_type", "value")
    (
        ev.write.format("parquet")
        .partitionBy("event_type")
        .mode("overwrite")
        .saveAsTable(name)
    )
    fact = spark.table(name)
    dim = (
        load_events(spark, sf_dir)
        .filter(
            F.col("event_type").startswith("p")
            | (F.col("event_type") == "error")
        )
        .select("event_type")
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            money(F.sum(dec4("value"))).alias("total_value"),
        )
    )


@query(
    "events_rolling_distinct_users",
    f"""
    WITH e AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             user_id
      FROM events
    ),
    wd AS (
      SELECT day, user_id // {_BM_WORD} AS w,
             bit_or(CAST(1 AS BIGINT)
                    << CAST(user_id % {_BM_WORD} AS INTEGER)) AS bm
      FROM e GROUP BY 1, 2
    ),
    days AS (
      SELECT unnest(generate_series((SELECT min(day) FROM e),
                                    (SELECT max(day) FROM e))) AS day
    ),
    words AS (SELECT DISTINCT w FROM wd),
    grid AS (
      SELECT d.day, words.w, COALESCE(wd.bm, 0) AS bm
      FROM days d CROSS JOIN words
      LEFT JOIN wd ON wd.day = d.day AND wd.w = words.w
    ),
    r AS (
      SELECT day, bm,
             bit_or(bm) OVER (PARTITION BY w ORDER BY day
                              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS bm7
      FROM grid
    )
    SELECT CAST(day AS INTEGER) AS day,
           CAST(sum(bit_count(bm)) AS BIGINT) AS distinct_users_1d,
           CAST(sum(bit_count(bm7)) AS BIGINT) AS distinct_users_7d
    FROM r GROUP BY day
    """,
)
def events_rolling_distinct_users(spark, sf_dir):
    """EXACT trailing-7-day rolling distinct users per day — the DAU/WAU
    dashboard series, and the aggregate ordinary rollups CANNOT give you:
    distinct doesn't add across days, so a naive exact answer re-scans a
    week of facts per day. The bitmap words of ``agg_bitmap_distinct``
    solve it structurally: per-(day, word) bitmaps reduce the facts ONCE,
    then a windowed ``bit_or`` over a dense day×word grid (OR is
    idempotent, so overlapping frames cost nothing) yields every day's
    exact 7-day bitmap, and popcounts finish the series. Shuffle story at
    100 TB: the fact table is touched once (map-side bit_or partial agg,
    one long per (day, word) cell); the grid is days × occupied-words
    (365 × id-space/62 — small relative to facts, and partitioned by word
    for the window so no global sort); everything downstream is
    grid-sized. The same words merge into ``agg_bitmap_distinct``'s
    all-time table and the streaming twin's snapshot — one summary,
    three consumers."""
    ev = load_events(spark, sf_dir).select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
            "day"
        ),
        "user_id",
    )
    bits = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_BM_WORD} AS INT))"
    )
    wd = (
        ev.select("day", F.expr(f"user_id DIV {_BM_WORD}").alias("w"), bits.alias("b"))
        .groupBy("day", "w")
        .agg(F.bit_or("b").alias("bm"))
    )
    span = ev.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    days = span.select(
        F.explode(F.sequence("mn", "mx")).alias("day")
    )
    words = wd.select("w").distinct()
    grid = (
        days.crossJoin(F.broadcast(words))  # |days| x |words| summary grid
        .join(wd, ["day", "w"], "left")
        .select("day", "w", F.coalesce("bm", F.lit(0)).alias("bm"))
    )
    w7 = Window.partitionBy("w").orderBy("day").rangeBetween(-6, 0)
    r = grid.withColumn("bm7", F.bit_or("bm").over(w7))
    return r.groupBy("day").agg(
        F.sum(F.bit_count("bm")).cast("long").alias("distinct_users_1d"),
        F.sum(F.bit_count("bm7")).cast("long").alias("distinct_users_7d"),
    )


_BLOOM_BITS = 992  # 16 x 62-bit words
_BLOOM_K = 3
_BLOOM_BAL = 7000.0  # dim selectivity: suppliers with s_acctbal above this


def _bloom_pos_sql(key: str, j: int) -> str:
    """DuckDB: hash row j's bloom bit position for `key` (3 sha256 hex
    nibbles -> 0..4095, mod the filter width)."""
    h = f"sha256(CAST({key} AS VARCHAR))"
    n = lambda i: f"(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"  # noqa: E731
    a, b, c = 3 * j + 1, 3 * j + 2, 3 * j + 3
    return f"(({n(a)} * 256 + {n(b)} * 16 + {n(c)}) % {_BLOOM_BITS})"


def _bloom_pos_col(key, j: int):
    h = F.sha2(F.col(key).cast("string"), 256)
    n = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1  # noqa: B023,E731
    a, b, c = 3 * j + 1, 3 * j + 2, 3 * j + 3
    return (n(a) * 256 + n(b) * 16 + n(c)) % _BLOOM_BITS


@query(
    "join_bloom_prefilter",
    f"""
    WITH dim AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal > {_BLOOM_BAL}
    ),
    dimpos AS (
      {' UNION ALL '.join(f"SELECT {_bloom_pos_sql('s_suppkey', j)} AS pos FROM dim" for j in range(_BLOOM_K))}
    ),
    words AS (
      SELECT pos // 62 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INTEGER)) AS bm
      FROM dimpos GROUP BY 1
    ),
    probe AS (
      SELECT l_suppkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS price,
             {', '.join(f"{_bloom_pos_sql('l_suppkey', j)} AS p{j}" for j in range(_BLOOM_K))}
      FROM lineitem
    ),
    pass AS (
      SELECT pr.l_suppkey, pr.price
      FROM probe pr
      {' '.join(f"JOIN words w{j} ON w{j}.w = pr.p{j} // 62 AND ((w{j}.bm >> CAST(pr.p{j} % 62 AS INTEGER)) & 1) = 1" for j in range(_BLOOM_K))}
    ),
    true_m AS (
      SELECT p.l_suppkey, p.price FROM pass p
      WHERE EXISTS (SELECT 1 FROM dim d WHERE d.s_suppkey = p.l_suppkey)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_fact_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM pass) AS n_bloom_pass,
           (SELECT CAST(count(*) AS BIGINT) FROM true_m) AS n_true_match,
           (SELECT CAST(count(*) AS BIGINT) FROM pass)
             - (SELECT CAST(count(*) AS BIGINT) FROM true_m)
             AS n_false_positives,
           (SELECT CAST(round(COALESCE(SUM(price), 0), 2) AS DOUBLE)
            FROM true_m) AS revenue
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Bloom-filter runtime prefilter for a selective fact⋈dim join — the
    pattern behind Spark's injected bloom runtime filters and every
    warehouse's join pushdown: reduce the dim's key set to a
    {_BLOOM_BITS}-bit filter ({_BLOOM_K} sha-derived positions per key,
    OR-folded into 62-bit words — {-(-_BLOOM_BITS // 62)} longs total),
    broadcast THAT instead of the keys, and drop fact rows whose bits
    aren't all set BEFORE the join. False positives survive the bloom and
    die in the exact verify (here a semi-join against the real dim), so
    the final result is provably the plain semi-join — which is what the
    oracle computes, alongside the pass/true/false-positive census that
    makes the filter's precision visible. At 100 TB the point is scan-side
    I/O: the bloom is a few hundred bytes broadcast to every task,
    killing most of the shuffle the join would have paid; the exact
    verify then touches only survivors. Portable sha-nibble hashing makes
    the whole filter — not just the end result — cross-engine EXACT.

    Hashing placement: a production bloom tests EVERY fact row with a
    non-cryptographic hash (xxhash-class, ~ns). The portable sha256 this
    oracle demands is ~100× that, so the filter is evaluated over the
    DISTINCT key domain (|suppliers|, not |lineitem| — measured 5.2 s →
    sub-second at sf0.1) and fact rows test membership through one
    broadcast join on the passing-key set; result-identical, and the
    right shape anyway whenever |keys| ≪ |rows|. With high-cardinality
    keys (|keys| ≈ |rows|) the per-row fast-hash form is the only
    option — the word-table arithmetic is unchanged."""
    dim = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > _BLOOM_BAL)
        .select("s_suppkey")
    )
    dimpos = dim.select(
        F.explode(
            F.array(*[_bloom_pos_col("s_suppkey", j) for j in range(_BLOOM_K)])
        ).alias("pos")
    )
    words = (
        dimpos.select(
            F.expr("pos DIV 62").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 62 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bm"))
    )
    probe = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", dec4("l_extendedprice").alias("price")
    )
    # bloom evaluated once per DISTINCT key (map-side partial distinct),
    # not per fact row — see the hashing-placement note above. All
    # _BLOOM_K bit tests go through ONE broadcast join over the exploded
    # (key, position) pairs: a key passes iff every position's bit is set
    # (count of set hits == K), which costs one broadcast exchange
    # instead of K.
    keypos = (
        probe.select("l_suppkey")
        .distinct()
        .select(
            "l_suppkey",
            F.explode(
                F.array(
                    *[_bloom_pos_col("l_suppkey", j) for j in range(_BLOOM_K)]
                )
            ).alias("pos"),
        )
    )
    kpass = (
        keypos.join(F.broadcast(words), F.expr("pos DIV 62") == F.col("w"))
        .filter(F.expr("(shiftright(bm, CAST(pos % 62 AS INT)) & 1) = 1"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == _BLOOM_K)
        .select("l_suppkey")
    )
    # ONE fact scan for the whole census: membership and truth ride in as
    # broadcast left-join flags (a dim key always passes the bloom — no
    # false negatives — so the true flag implies the bloom flag), and the
    # four statistics fold in a single conditional aggregate instead of
    # four scans of the serial single-row-group fixture file.
    flagged = (
        probe.join(
            F.broadcast(kpass.withColumn("bloom_hit", F.lit(1))),
            "l_suppkey",
            "left",
        )
        .join(
            F.broadcast(
                dim.select(F.col("s_suppkey").alias("l_suppkey")).withColumn(
                    "true_hit", F.lit(1)
                )
            ),
            "l_suppkey",
            "left",
        )
    )
    return flagged.agg(
        F.count("*").alias("n_fact_rows"),
        F.count("bloom_hit").alias("n_bloom_pass"),
        F.count("true_hit").alias("n_true_match"),
        (F.count("bloom_hit") - F.count("true_hit")).alias(
            "n_false_positives"
        ),
        money(
            F.coalesce(
                F.sum(F.when(F.col("true_hit") == 1, F.col("price"))), F.lit(0)
            )
        ).alias("revenue"),
    )


_N_RANGE = 16  # range partitions for the distributed global rank


def _global_rank(df, *order_cols):
    """Distributed EXACT global row_number over ``order_cols`` (must form a
    unique total order) with NO single-partition window — the scale-safe
    replacement for ``Window.orderBy`` at data grain:

    1. ``repartitionByRange`` on the order columns (sampled boundaries;
       partition i's tuples all precede partition i+1's),
    2. per-partition ``row_number`` (window partitioned by partition id —
       every partition ranks in parallel),
    3. add each partition's preceding-row offset (one bounded
       ``_N_RANGE``-row aggregate to the driver — the same bounded-scalar
       pattern as the two-pass percentile ops).

    Durability: the pin (``materialize.pin``) defaults to
    ``localCheckpoint`` — executor block storage, so on a real cluster an
    executor loss between the passes FAILS (not corrupts) the job. The
    100 TB recipe is now code, not prose: ``reliable=True`` (or env
    ``SPARK_GRAFT_RELIABLE_PIN=1``) swaps in Spark's durable
    ``checkpoint()`` when a checkpoint dir is set, else
    ``persist(DISK_ONLY_2)``, at the cost of one extra write of the
    ranged table — exercised by tests/test_scale_ops.py. Local single-JVM
    runs (this harness) cannot lose an executor, so cheap is the default.

    Returns (ranked_df with ``rk`` column, total row count n).
    """
    ranged = pin(
        df.repartitionByRange(_N_RANGE, *order_cols)
        .withColumn("pid", F.spark_partition_id())
    )  # pin partition ids across the two passes
    rows = ranged.groupBy("pid").agg(F.count("*").alias("c")).orderBy("pid").collect()  # driver-scalar (bounded: _N_RANGE rows)
    offsets, acc = {}, 0
    for r in rows:
        offsets[r["pid"]] = acc
        acc += r["c"]
    off = F.create_map(
        *[F.lit(x) for p, o in offsets.items() for x in (p, o)]
    )[F.col("pid")]
    wlocal = Window.partitionBy("pid").orderBy(*order_cols)
    ranked = ranged.withColumn(
        "rk", (F.row_number().over(wlocal) + off).cast("long")
    ).drop("pid")
    return ranked, acc


def _global_adjacent_pairs(df, order_cols, keep):
    """All globally-ADJACENT row pairs under the unique total order
    ``order_cols`` — the rank-free replacement for the
    ``_global_rank`` → ``rk ↔ rk+1`` self-join idiom (round-15
    optimization, guide §2.4: remove shuffles outright).

    Why: the self-join form pins the ranged table, then BOTH join sides
    recompute the ranking window from the pin and re-exchange + re-sort
    the full table on ``rk`` (2 hash exchanges + 2 sorts + the merge
    join — measured 8.2 → 4.8 s already spread, and this removes the
    remaining join machinery). Adjacency is computable with ZERO extra
    exchanges: within each range partition the ranking window's own
    ``lead()`` produces the next row, and the ≤``_N_RANGE``−1 pairs that
    straddle partition boundaries are the (last row of partition p,
    first row of the next non-empty partition) pairs — a bounded driver
    scalar (the offsets-collect class), re-emitted as a local relation.

    1. ``repartitionByRange`` on the order columns + ``pid``, pinned —
       exactly ``_global_rank`` step 1 (the pin now also materializes
       the lead columns, so the window is computed ONCE, in the pin job,
       instead of once per join side);
    2. per-partition ``lead()`` over the same window spec the rank used —
       every within-partition adjacent pair, no new exchange;
    3. boundary pairs from two bounded collects (≤``_N_RANGE`` rows
       each — same driver-transfer class as the rank's offset collect),
       chained across EMPTY partitions by pid order.

    ``keep``: the payload columns to surface; the pair frame carries
    ``<c>_l`` / ``<c>_r`` for each. Order columns must form a unique
    total order (the ``_global_rank`` contract), so adjacency is
    boundary-placement-invariant and the pair SET is exactly the rank
    form's — law-pinned in tests/test_round15_opt.py."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    w = Window.partitionBy("pid").orderBy(*order_cols)
    marked = pin(
        df.repartitionByRange(_N_RANGE, *order_cols)
        .withColumn("pid", F.spark_partition_id())
        .select(
            "pid",
            *keep,
            F.row_number().over(w).alias("_rn"),
            F.lead(F.lit(1)).over(w).alias("_has_next"),
            *[F.lead(c).over(w).alias(f"_n_{c}") for c in keep],
        )
    )
    within = marked.filter(F.col("_has_next").isNotNull()).select(
        *[F.col(c).alias(f"{c}_l") for c in keep],
        *[F.col(f"_n_{c}").alias(f"{c}_r") for c in keep],
    )
    # driver-scalar (bounded: <= 2*_N_RANGE rows, one-or-two per
    # non-empty range partition) — the same bounded-transfer class as
    # _global_rank's per-partition offset collect. Round-15 opt
    # session 6: ONE OR-filter job over the pinned table instead of two
    # (the lasts/firsts collects scanned the same pin back to back; the
    # driver classifies — a single-row partition lands in both lists,
    # exactly as it did from the two separate filters). Outputs proven
    # identical at all three SFs for both suffix consumers; timing
    # mildly positive on a jittery box (q23 med 2.95 → 2.77, min
    # 2.66 → 2.51; tools/slope_runs/r15opt4/ab_adj_one_collect.log) —
    # shipped for the removed bounded job, the q21-precedent class.
    rows_b = (
        marked.filter(F.col("_has_next").isNull() | (F.col("_rn") == 1))
        .select("pid", "_rn", "_has_next", *keep)
        .collect()  # driver-bounded: <= 2*_N_RANGE rows
    )
    lasts = sorted(
        (r for r in rows_b if r["_has_next"] is None), key=lambda r: r["pid"]
    )
    firsts = sorted(
        (r for r in rows_b if r["_rn"] == 1), key=lambda r: r["pid"]
    )
    fields = [
        T.StructField(f"{c}_{side}", df.schema[c].dataType)
        for side in ("l", "r")
        for c in keep
    ]
    rows = [
        tuple([lt[c] for c in keep] + [ft[c] for c in keep])
        for lt, ft in zip(lasts[:-1], firsts[1:])
    ]
    boundary = spark.createDataFrame(rows, T.StructType(fields))
    return within.unionByName(boundary)


def _topk_ranked(df, k: int, *order_cols):
    """Exact global top-``k`` rows with a 1-based ``rk`` rank column and NO
    single-partition window anywhere in the plan — the scale-safe
    replacement for the ``row_number() OVER (ORDER BY ...)  WHERE rk <= K``
    idiom (VERDICT r7 item 4): that form sorts the ENTIRE input through
    one WindowExec task just to keep K rows.

    1. ``orderBy(order_cols).limit(k)`` — Spark plans this as
       TakeOrderedAndProject: each partition keeps its local top-k, the
       driver merges K·p candidate rows — no global sort, no shuffle of
       the full input;
    2. re-rank the K survivors with :func:`_global_rank` (range
       repartition + per-partition row_number + bounded offset fix-up),
       so even the K-row rerank carries no ``Exchange SinglePartition``
       and the global sweep plan-assertion holds uniformly.

    ``order_cols`` must form a unique total order (same contract as
    ``_global_rank``). Returns the K-row frame with ``rk`` (long)."""
    top = df.orderBy(*order_cols).limit(k)
    ranked, _ = _global_rank(top, *order_cols)
    return ranked


def _global_cumsum(df, value_col, *order_cols):
    """Distributed EXACT global running sum of ``value_col`` over the
    total order ``order_cols`` — the prefix-sum sibling of
    :func:`_global_rank` (a bare ``SUM(...) OVER (ORDER BY ...)`` is the
    same single-partition WindowExec trap the rank machinery replaces):

    1. ``repartitionByRange`` on the order columns,
    2. per-partition running sum (window partitioned by partition id),
    3. add each partition's preceding-partitions total (one bounded
       ``_N_RANGE``-row aggregate to the driver — the shared
       bounded-scalar pattern; totals are summed driver-side in
       partition order, so use an EXACT value type: decimal/integer, not
       float).

    Same pin-durability switch as `_global_rank` (see its docstring —
    ``materialize.pin``'s reliable path is the cluster recipe, executable
    and tested). Returns the frame with a ``cum`` column added."""
    ranged = pin(
        df.repartitionByRange(_N_RANGE, *order_cols)
        .withColumn("pid", F.spark_partition_id())
    )  # pin partition ids across the two passes
    totals = ranged.groupBy("pid").agg(F.sum(value_col).alias("t")).orderBy("pid").collect()  # driver-scalar (bounded: _N_RANGE rows)
    offsets, acc = {}, None
    for r in totals:
        offsets[r["pid"]] = acc
        acc = r["t"] if acc is None else acc + r["t"]
    off = F.create_map(
        *[
            x
            for p, o in offsets.items()
            for x in (F.lit(p), F.lit(o if o is not None else 0))
        ]
    )[F.col("pid")]
    wlocal = (
        Window.partitionBy("pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("cum", F.sum(value_col).over(wlocal) + off)
        .drop("pid")
    )


def _ntile_from_rank(rk, n: int, k: int):
    """Exact ntile(k) bucket from a 1-based unique global rank — all-integer
    (ceil(a/b) as (a+b-1) DIV b), bit-equal to SQL ntile: the first
    ``n % k`` buckets take ``n//k + 1`` rows, the rest ``n//k``."""
    q, rem = divmod(n, k)
    boundary = rem * (q + 1)
    # ceil(rk / (q+1)) and ceil((rk - boundary) / q), integer-exact
    first = F.expr(f"CAST((rk + {q}) DIV {q + 1} AS INT)")
    if q == 0:  # n < k: every row is its own bucket (rk <= boundary always)
        return first
    rest = F.expr(f"CAST({rem} + (rk - {boundary} + {q - 1}) DIV {q} AS INT)")
    return F.when(rk <= boundary, first).otherwise(rest)


@query(
    "customer_value_quartiles_scalable",
    """
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS r
      FROM orders GROUP BY o_custkey
    ),
    q AS (SELECT o_custkey, r, ntile(4) OVER (ORDER BY r, o_custkey) AS quartile
          FROM rev)
    SELECT CAST(quartile AS INTEGER) AS quartile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(SUM(r), 2) AS DOUBLE) AS total_revenue,
           CAST(round(min(r), 2) AS DOUBLE) AS min_revenue,
           CAST(round(max(r), 2) AS DOUBLE) AS max_revenue
    FROM q GROUP BY quartile
    """,
)
def customer_value_quartiles_scalable(spark, sf_dir):
    """``customer_value_quartiles`` with the single-partition window
    REMOVED — the scale-safe quantile segmentation (VERDICT r5 weak-family
    fix): the plain op's ``ntile(4) OVER (ORDER BY ...)`` moves every
    customer row through ONE partition (WindowExec warns); this twin
    computes the identical quartile assignment via the distributed
    global-rank machinery (:func:`_global_rank`: range repartition →
    parallel per-partition row_number → bounded offset fix-up) plus the
    all-integer ntile formula (:func:`_ntile_from_rank`) — and the oracle
    still runs the ntile form, so equality is PROVEN, not argued. Scale:
    every stage is ``|customers| / _N_RANGE`` per task; driver traffic is
    one 16-row count table. The tie-break (r, o_custkey) is a unique
    total order, so ranks — and therefore buckets — are deterministic
    cross-engine."""
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec4("o_totalprice")).alias("r"))
    )
    ranked, n = _global_rank(rev, "r", "o_custkey")
    q = ranked.withColumn(
        "quartile", _ntile_from_rank(F.col("rk"), n, 4)
    )
    return q.groupBy("quartile").agg(
        F.count("*").alias("n_customers"),
        money(F.sum("r")).alias("total_revenue"),
        money(F.min("r")).alias("min_revenue"),
        money(F.max("r")).alias("max_revenue"),
    )


@query(
    "rfm_segmentation_scalable",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, frequency, monetary,
             ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM per_cust
    )
    SELECT o_custkey,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(round(monetary, 2) AS DOUBLE) AS monetary,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CASE WHEN r_score = 1 AND f_score <= 2 AND m_score <= 2
                  THEN 'champion'
                WHEN r_score <= 2 AND f_score <= 3 THEN 'loyal'
                WHEN r_score >= 4 AND m_score <= 2 THEN 'at_risk_big_spender'
                WHEN r_score >= 4 THEN 'dormant'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def rfm_segmentation_scalable(spark, sf_dir):
    """``rfm_segmentation`` with all three single-partition ntile windows
    replaced by the distributed global-rank machinery — the other half of
    the VERDICT r5 weak-family fix. Each of the R/F/M quintile scores is
    an independent :func:`_global_rank` (range repartition on its own
    sort order, parallel per-partition row_number, bounded offset fix-up)
    fed through the all-integer ntile formula; the three score tables
    then re-join on custkey (hash joins at customer grain — shuffle-
    parallel, no global sort anywhere). The oracle runs the plain ntile
    form, so the rank machinery is value-PROVEN equal on all three
    orderings, including the descending ones. Scale: 3 ranked passes +
    one 3-way customer-grain join; every task is |customers|/_N_RANGE.

    Round-15 opt: the three passes are INDEPENDENT (each reads only the
    pinned per_cust) but each ``_global_rank`` call runs two eager jobs
    (range pin + bounded offsets collect) before returning, so calling
    them back-to-back serializes six small jobs on a mostly-idle
    cluster. They are submitted from a 3-thread pool instead (guide
    §2.6 — actions are only sequential because the driver calls them
    sequentially; FIFO scheduling back-fills the tails). Deterministic:
    each pass's result is independent of submission order, and the
    composition below is built after all three return. Measured
    interleaved A/B at sf0.1: med 2.02 → 1.41 single-file / 2.59 → 1.87
    multifile, pairwise-dominant on every rep, outputs identical at all
    three SFs (tools/slope_runs/r15opt4/ab_rfm_overlap.log)."""
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(dec4("o_totalprice")).alias("monetary"),
        )
        # one eager materialization: the three rank passes AND the final
        # join would otherwise each re-aggregate the orders fact (4 scans;
        # measured 2.9 s -> see BASELINE round-6 notes). |customers| rows.
        .localCheckpoint()
    )

    def score(order_col, name):
        ranked, n = _global_rank(
            per_cust.select("o_custkey", order_col.alias("_k")),
            F.desc("_k"),
            F.col("o_custkey"),
        )
        return ranked.select(
            "o_custkey",
            _ntile_from_rank(F.col("rk"), n, 5).alias(name),
        )

    with ThreadPoolExecutor(max_workers=3) as _pool:
        _fr = _pool.submit(score, F.col("last_order"), "r_score")
        _ff = _pool.submit(score, F.col("frequency"), "f_score")
        _fm = _pool.submit(score, F.col("monetary"), "m_score")
        r_sc, f_sc, m_sc = _fr.result(), _ff.result(), _fm.result()

    scored = (
        per_cust.join(r_sc, "o_custkey")
        .join(f_sc, "o_custkey")
        .join(m_sc, "o_custkey")
    )
    seg = (
        F.when(
            (F.col("r_score") == 1)
            & (F.col("f_score") <= 2)
            & (F.col("m_score") <= 2),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 3), "loyal")
        .when(
            (F.col("r_score") >= 4) & (F.col("m_score") <= 2),
            "at_risk_big_spender",
        )
        .when(F.col("r_score") >= 4, "dormant")
        .otherwise("regular")
    )
    return scored.select(
        "o_custkey",
        "frequency",
        money("monetary").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    )


@query(
    "join_bloom_prefilter_fast",
    f"""
    WITH dim AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal > {_BLOOM_BAL}
    ),
    true_m AS (
      SELECT l_suppkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS price
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM dim d WHERE d.s_suppkey = l_suppkey)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_fact_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM true_m) AS n_true_match,
           (SELECT CAST(round(COALESCE(SUM(price), 0), 2) AS DOUBLE)
            FROM true_m) AS revenue
    """,
)
def join_bloom_prefilter_fast(spark, sf_dir):
    """The PRODUCTION form of ``join_bloom_prefilter`` (VERDICT r5 item 6):
    per-row non-cryptographic hashing — ``xxhash64(key, seed_j)``, the
    ~ns-class hash the sha-portable twin only documents — with the whole
    {_BLOOM_BITS}-bit word table embedded as a 16-long LITERAL array, so
    the probe side is a pure narrow filter: no join, no shuffle, whole-
    stage codegen end to end. The dim side folds its {_BLOOM_K} positions
    per key into the word table ({-(-_BLOOM_BITS // 62)} longs) and ships
    it to the driver once (bounded driver-scalar, same class as the
    two-pass percentile fix-ups); that is exactly what Spark's injected
    runtime bloom filters do with ``ObjectHashAggregate`` + broadcast.

    xxhash64 exists only Spark-side, so the oracle cannot replay the
    filter — instead the OUTPUT is restricted to the hash-INDEPENDENT
    census (total fact rows, true matches, revenue): the bloom is a pure
    prefilter, so the result must equal the plain semi-join the oracle
    runs. The EXACT gate therefore PROVES the no-false-negative law on
    the fixture (a dropped true match would split the hash); the
    pass-rate internals (false positives etc.) are pinned by invariant
    tests in tests/test_scale_ops.py rather than an oracle."""
    dim = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > _BLOOM_BAL)
        .select("s_suppkey")
    )
    dimpos = dim.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col("s_suppkey"), F.lit(j)),
                        F.lit(_BLOOM_BITS),
                    )
                    for j in range(_BLOOM_K)
                ]
            )
        ).alias("pos")
    )
    words = (
        dimpos.select(
            F.expr("pos DIV 62").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 62 AS INT))").alias(
                "b"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bm"))
    )
    packed = words.agg(F.collect_list(F.struct("w", "bm")).alias("ws")).collect()  # driver-scalar (bounded: <=16 bloom words)
    arr = [0] * (-(-_BLOOM_BITS // 62))
    for s in packed[0]["ws"]:
        arr[s["w"]] = s["bm"]

    def bit_test(j: int) -> str:
        p = f"pmod(xxhash64(l_suppkey, {j}), {_BLOOM_BITS})"
        return (
            f"((shiftright(element_at(bw, CAST({p} DIV 62 AS INT) + 1),"
            f" CAST({p} % 62 AS INT)) & 1) = 1)"
        )

    bloom_hit = F.expr(" AND ".join(bit_test(j) for j in range(_BLOOM_K)))
    probe = (
        load(spark, sf_dir, "lineitem")
        .select("l_suppkey", dec4("l_extendedprice").alias("price"))
        .withColumn("bw", F.array(*[F.lit(x) for x in arr]))
        .withColumn("bloom_hit", bloom_hit)
    )
    flagged = probe.join(
        F.broadcast(
            dim.select(F.col("s_suppkey").alias("l_suppkey")).withColumn(
                "true_hit", F.lit(1)
            )
        ),
        "l_suppkey",
        "left",
    )
    # prefilter-then-verify expressed as one conditional aggregate: a true
    # match only counts if it SURVIVED the bloom — oracle equality with the
    # plain semi-join is therefore the no-false-negative proof
    hit = F.col("bloom_hit") & (F.col("true_hit") == 1)
    return flagged.agg(
        F.count("*").alias("n_fact_rows"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_true_match"),
        money(F.coalesce(F.sum(F.when(hit, F.col("price"))), F.lit(0))).alias(
            "revenue"
        ),
    )


# --- self-tuning bloom width (VERDICT r13 item 3) -----------------------------
#
# Fixed-point constants for the standard sizing rules, chosen so BOTH
# engines derive m and k with pure INTEGER arithmetic (no ln(), no float
# rounding at the boundary):
#   m = -n ln p / (ln 2)^2  with p = 0.01  ->  m ~= 9.5851 n ~ (9585 n)/1000
#   k =  m/n ln 2                          ->  k ~= round(693 m / 1000 n)
# m is rounded UP to whole 62-bit words (the word-table unit), k rounded
# half-up; every operand is positive, so Spark's DIV (truncate) and
# DuckDB's // (floor) agree exactly.
_BLOOM_FP_M = 9585  # per-mille of -ln(0.01)/ln(2)^2 = 9.5851
_BLOOM_FP_K = 693  # per-mille of ln(2) = 0.6931
_BLOOM_AUTO_KMAX = 32  # j-grid bound; binds only when n < ~2 keys/word


def _bloom_auto_params(n: int) -> tuple[int, int, int]:
    """(n0, m, k) from the dim key count — the Python twin of the SQL
    derivation inlined in the oracle (same integer fixed-point rules)."""
    n0 = max(n, 1)
    words = (_BLOOM_FP_M * n0 + 61999) // 62000
    m = 62 * words
    k = max(1, min(_BLOOM_AUTO_KMAX, (2 * _BLOOM_FP_K * m + 1000 * n0) // (2000 * n0)))
    return n0, m, k


def _bloom_auto_pos_sql(key: str) -> str:
    """DuckDB: bit position for (``key``, slot column ``j``) under derived
    width column ``m`` — first 8 sha256 nibbles as a 32-bit int, mod m.
    Salting the hash with j (vs slicing one digest) keeps k unbounded by
    the digest length; the polynomial mirrors Spark's conv(substr(h,1,8))."""
    h = f"sha256(CAST({key} AS VARCHAR) || '|' || CAST(j AS VARCHAR))"
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({terms}) % m)"


_BLOOM_AUTO_PRM_SQL = f"""
    dim AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal > {_BLOOM_BAL}
    ),
    prm AS (
      SELECT n,
             62 * (({_BLOOM_FP_M} * n + 61999) // 62000) AS m,
             GREATEST(1, LEAST({_BLOOM_AUTO_KMAX},
               (2 * {_BLOOM_FP_K} * 62 * (({_BLOOM_FP_M} * n + 61999) // 62000)
                + 1000 * n) // (2000 * n))) AS k
      FROM (SELECT GREATEST(count(*), 1) AS n FROM dim) nc
    ),
    js AS (SELECT unnest(range({_BLOOM_AUTO_KMAX})) AS j)"""


@query(
    "join_bloom_prefilter_auto",
    f"""
    WITH {_BLOOM_AUTO_PRM_SQL},
    dimpos AS (
      SELECT {_bloom_auto_pos_sql('s_suppkey')} AS pos
      FROM dim, prm, js WHERE j < k
    ),
    words AS (
      SELECT pos // 62 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INTEGER)) AS bm
      FROM dimpos GROUP BY 1
    ),
    probe AS (
      SELECT l_suppkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS price
      FROM lineitem
    ),
    keypos AS (
      SELECT l_suppkey, {_bloom_auto_pos_sql('l_suppkey')} AS pos
      FROM (SELECT DISTINCT l_suppkey FROM probe) dk, prm, js WHERE j < k
    ),
    kpass AS (
      SELECT kp.l_suppkey
      FROM keypos kp JOIN words w
        ON w.w = kp.pos // 62
       AND ((w.bm >> CAST(kp.pos % 62 AS INTEGER)) & 1) = 1
      GROUP BY kp.l_suppkey HAVING count(*) = (SELECT k FROM prm)
    ),
    pass AS (
      SELECT pr.l_suppkey, pr.price FROM probe pr
      WHERE pr.l_suppkey IN (SELECT l_suppkey FROM kpass)
    ),
    true_m AS (
      SELECT p.l_suppkey, p.price FROM pass p
      WHERE EXISTS (SELECT 1 FROM dim d WHERE d.s_suppkey = p.l_suppkey)
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM prm) AS n_dim_keys,
           (SELECT CAST(m AS BIGINT) FROM prm) AS m_bits,
           (SELECT CAST(k AS BIGINT) FROM prm) AS k_hashes,
           (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_fact_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM pass) AS n_bloom_pass,
           (SELECT CAST(count(*) AS BIGINT) FROM true_m) AS n_true_match,
           (SELECT CAST(count(*) AS BIGINT) FROM pass)
             - (SELECT CAST(count(*) AS BIGINT) FROM true_m)
             AS n_false_positives,
           (SELECT CAST(round(COALESCE(SUM(price), 0), 2) AS DOUBLE)
            FROM true_m) AS revenue
    """,
)
def join_bloom_prefilter_auto(spark, sf_dir):
    """``join_bloom_prefilter`` with the filter width and hash count
    DERIVED AT BUILD TIME from the dim's key count — the fix for the
    repo's last fixed-at-fixture-scale sizing knob (VERDICT r13 item 3):
    at a 100 TB key domain the fixed {_BLOOM_BITS}-bit filter saturates
    (fp → 1) and the prefilter silently degrades to a full-scan pass-
    through. The standard rules m = −n·ln p/(ln 2)² (p = 0.01) and
    k = m/n·ln 2 are evaluated in integer FIXED-POINT (per-mille
    constants {_BLOOM_FP_M}/{_BLOOM_FP_K}; m rounded up to whole 62-bit
    words, k half-up, every operand positive so Spark DIV ≡ DuckDB //),
    and the derivation itself is part of the EXACT oracle: the SQL
    re-derives n/m/k from the same count via scalar subqueries and the
    result row EXPOSES them as columns, so a drifted rule — not just a
    drifted result — fails the driver gate. One bounded driver scalar
    (``dim.count()``, the house two-pass idiom) feeds the Spark side.

    Per-slot hashing salts sha256 with the slot index (``key || '|' || j``,
    first 8 nibbles mod m) instead of slicing one digest like the fixed
    key — k is therefore unbounded by digest length (the fixed key's 3
    slots exhaust its 12-nibble budget; the derived k here is ~7 at
    p = 0.01 and up to {_BLOOM_AUTO_KMAX} at tiny n, where word-rounding
    makes m/n large and fp ≈ 0 regardless, so the cap never costs
    precision where it binds). Bloom evaluated once per DISTINCT key and
    membership broadcast, exactly as the fixed key documents; false
    positives die in the exact verify, so n_true_match/revenue equal the
    plain semi-join at ANY width — the no-false-negative law the oracle
    gate proves alongside the sizing.

    Scale shape (100 TB): identical to the fixed key — the filter stays
    a broadcast of m/8 bytes ≈ 1.2 B per dim key (vs 8 B for the key set
    itself), the probe side is one broadcast join over distinct keys —
    PLUS the property the fixed key lacks: fp is ~p at EVERY n, so the
    pass set stays ~|true matches| instead of drifting toward the full
    fact table. Measured in the r14 slope census (supplier co-shift):
    see SCALING.md §19."""
    dim = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > _BLOOM_BAL)
        .select("s_suppkey")
    )
    n0, m, k = _bloom_auto_params(dim.count())  # bounded driver scalar

    def pos_col(key: str):
        h = F.sha2(
            F.concat(
                F.col(key).cast("string"), F.lit("|"), F.col("j").cast("string")
            ),
            256,
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m

    jgrid = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    dimpos = dim.select("s_suppkey", jgrid).select(pos_col("s_suppkey").alias("pos"))
    words = (
        dimpos.select(
            F.expr("pos DIV 62").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 62 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bm"))
    )
    probe = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", dec4("l_extendedprice").alias("price")
    )
    keypos = (
        probe.select("l_suppkey")
        .distinct()
        .select("l_suppkey", jgrid)
        .select("l_suppkey", pos_col("l_suppkey").alias("pos"))
    )
    kpass = (
        keypos.join(F.broadcast(words), F.expr("pos DIV 62") == F.col("w"))
        .filter(F.expr("(shiftright(bm, CAST(pos % 62 AS INT)) & 1) = 1"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == k)
        .select("l_suppkey")
    )
    flagged = probe.join(
        F.broadcast(kpass.withColumn("bloom_hit", F.lit(1))),
        "l_suppkey",
        "left",
    ).join(
        F.broadcast(
            dim.select(F.col("s_suppkey").alias("l_suppkey")).withColumn(
                "true_hit", F.lit(1)
            )
        ),
        "l_suppkey",
        "left",
    )
    rep = flagged.agg(
        F.count("*").alias("n_fact_rows"),
        F.count("bloom_hit").alias("n_bloom_pass"),
        F.count("true_hit").alias("n_true_match"),
        (F.count("bloom_hit") - F.count("true_hit")).alias("n_false_positives"),
        money(
            F.coalesce(
                F.sum(F.when(F.col("true_hit") == 1, F.col("price"))), F.lit(0)
            )
        ).alias("revenue"),
    )
    # derived sizing EXPOSED as result columns — the oracle re-derives them
    # in SQL, so the rule itself is driver-graded, not just the census
    return rep.select(
        F.lit(n0).cast("long").alias("n_dim_keys"),
        F.lit(m).cast("long").alias("m_bits"),
        F.lit(k).cast("long").alias("k_hashes"),
        "n_fact_rows",
        "n_bloom_pass",
        "n_true_match",
        "n_false_positives",
        "revenue",
    )


@query(
    "win_ntile_scalable",
    """
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
    FROM customer
    """,
)
def win_ntile_scalable(spark, sf_dir):
    """C21's scale-safe twin — the last member of the VERDICT r5 global-
    ntile weak family: same (c_custkey, quartile) rows as ``win_ntile``,
    but the single-partition window is replaced by the distributed
    global-rank machinery + all-integer ntile formula. The oracle runs
    the plain ntile, so equality is proven at DATA grain (every customer
    row carries its bucket — unlike the segmentation twins this op
    returns the full assignment, which is what a downstream join
    consumes)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked, n = _global_rank(cust, "c_acctbal", "c_custkey")
    return ranked.select(
        "c_custkey", _ntile_from_rank(F.col("rk"), n, 4).alias("quartile")
    )


from .text import ORACLES as _TEXT_ORACLES  # noqa: E402


@query(
    "corpus_perplexity_buckets_scalable",
    _TEXT_ORACLES["corpus_perplexity_buckets"],  # identical oracle: the
    # rank machinery must answer the ntile form's SQL verbatim
)
def corpus_perplexity_buckets_scalable(spark, sf_dir):
    """CCNet head/middle/tail split WITHOUT the single-partition tercile
    window: scores come from the same ``text_unigram_logprob`` op, the
    tercile cut from :func:`_global_rank` + the integer ntile formula —
    answering the ORIGINAL op's oracle verbatim, so the rank machinery is
    proven equal to the ntile form on a second, document-grain ordering
    (6dp float scores with doc_id tie-break). Closes the whole r5
    'global single-partition window at data grain' weak family."""
    from .text import QUERIES as TEXT_QUERIES

    scored = TEXT_QUERIES["text_unigram_logprob"](spark, sf_dir)
    ranked, n = _global_rank(
        scored.select("doc_id", "avg_neg_logprob", "n_tokens"),
        "avg_neg_logprob",
        "doc_id",
    )
    b = ranked.withColumn("bucket", _ntile_from_rank(F.col("rk"), n, 3))
    name = (
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
    )
    return b.groupBy(name.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.min("avg_neg_logprob"), 6).alias("score_min"),
        F.round(F.max("avg_neg_logprob"), 6).alias("score_max"),
    )


@query(
    "agg_exact_weighted_median",
    """
    WITH t AS (
      SELECT l_extendedprice AS x, CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    tot AS (SELECT SUM(w) AS W FROM t),
    r AS (
      SELECT x, SUM(w) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cw
      FROM t
    )
    SELECT (SELECT CAST(W AS BIGINT) FROM tot) AS total_weight,
           (SELECT min(x) FROM r, tot WHERE cw >= (W + 1) // 2)
             AS weighted_median,
           (SELECT CAST(count(*) AS BIGINT) FROM t, tot
            WHERE floor(x) = floor((SELECT min(x) FROM r, tot
                                    WHERE cw >= (W + 1) // 2)))
             AS n_bucket_scanned
    """,
)
def agg_exact_weighted_median(spark, sf_dir):
    """EXACT WEIGHTED median (smallest x whose cumulative weight reaches
    ⌈W/2⌉ — integer weights, so the target rank is exact) — the curation
    form of the two-pass order-statistic family: 'median quality score
    weighted by token count' is this op with (score, n_tokens); here
    (l_extendedprice, l_quantity) exercises it on the big fact table.

    Same two-pass prune as ``agg_exact_median_twopass``, generalized to
    weights: pass 1 histograms WEIGHT mass into integer buckets and walks
    the cumulative masses to the target bucket; pass 2 rescans ONLY that
    bucket (pushed predicate), collapses it per distinct value (weights
    re-sum — associative), and takes the first value whose in-bucket
    cumulative weight crosses the residual target. BOTH cumulative walks
    ride ``_global_cumsum`` (round 9 — the histogram one was the
    build-side single-partition-window catch; the in-bucket one was
    bucket-bounded-admissible but the uniform machinery costs the same
    and leaves zero WindowExec-global sites in the family).
    Determinism under ties: rows of equal x always expose their full
    cumulative mass at the value's last row, so 'min x with cum ≥ k' is
    order-independent — the oracle's per-row running sum and the
    per-value collapse here provably agree. Driver traffic: two bounded
    scalars, as in the unweighted op."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    W = li.agg(F.sum("w").alias("W")).collect()[0][0]  # driver-scalar
    k = (W + 1) // 2
    hist = li.groupBy(F.floor("x").alias("b")).agg(F.sum("w").alias("c"))
    # histogram cumulative mass via _global_cumsum (buckets ∝ value
    # range — the bare global window here was the round-9 build-side
    # WindowExec catch); the in-bucket walk below rides the same
    # machinery (see docstring)
    cum = (
        _global_cumsum(hist, "c", "b")
        .filter(F.col("cum") >= k)
        .orderBy("b")
        .limit(1)
    )
    row = cum.agg(F.min("b").alias("b"), F.min(F.col("cum") - F.col("c")).alias("prev")).collect()[0]  # driver-scalar
    k_res = int(k - row["prev"])
    in_bucket = li.filter(F.floor("x") == row["b"])
    vals = in_bucket.groupBy("x").agg(F.sum("w").alias("vw"))
    med = (
        _global_cumsum(vals, "vw", "x")
        .filter(F.col("cum") >= k_res)
        .agg(F.min("x").alias("weighted_median"))
    )
    n_bucket = in_bucket.agg(F.count("*").alias("n_bucket_scanned"))
    return (
        med.crossJoin(F.broadcast(n_bucket))  # 1 row x 1 row
        .select(
            F.lit(W).cast("long").alias("total_weight"),
            "weighted_median",
            "n_bucket_scanned",
        )
    )


@query(
    "scan_agg_pushdown_stats",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_quantity) AS DOUBLE) AS min_qty,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty,
           CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    """,
)
def scan_agg_pushdown_stats(spark, sf_dir):
    """Footer-metadata aggregation: COUNT/MIN/MAX answered from parquet
    row-group statistics WITHOUT scanning data pages — Spark's parquet
    aggregate pushdown (``spark.sql.parquet.aggregatePushdown``, v2
    DataSource path), the reason a 100 TB ``count(*)`` costs milliseconds
    of footer reads instead of a full scan. The plan shows
    ``PushedAggregation: [COUNT(*), MIN(...), ...]`` (probed 4.1.2;
    asserted in tests/test_plans.py) and the scan reads zero data columns.

    Session hygiene: the two confs are flipped only around an EAGER
    ``localCheckpoint`` (pushdown is decided at optimization time, i.e.
    at execution — a lazy return would escape the conf window), then
    restored — the shared driver session never sees leaked state, and
    later queries keep their v1 source plans. The checkpointed result is
    one row."""
    keys = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        out = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(
                F.count("*").alias("n_rows"),
                F.min("l_quantity").cast("double").alias("min_qty"),
                F.max("l_quantity").cast("double").alias("max_qty"),
                F.min("l_extendedprice").cast("double").alias("min_price"),
                F.max("l_extendedprice").cast("double").alias("max_price"),
            )
            .localCheckpoint()  # execute UNDER the pushdown confs
        )
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    return out


@query(
    "orders_pareto_class",
    """
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS r
      FROM orders GROUP BY o_custkey
    ),
    c AS (
      SELECT o_custkey, r,
             SUM(r) OVER (ORDER BY r DESC, o_custkey) AS cum
      FROM rev
    ),
    t AS (SELECT SUM(r) AS tot FROM rev),
    cls AS (
      SELECT o_custkey, r,
             CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                  WHEN cum * 100 <= tot * 95 THEN 'B'
                  ELSE 'C' END AS cls
      FROM c, t
    )
    SELECT cls AS pareto_class,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(SUM(r), 2) AS DOUBLE) AS revenue,
           round(CAST(SUM(r) AS DOUBLE)
                 / CAST((SELECT tot FROM t) AS DOUBLE), 6) AS revenue_share
    FROM cls GROUP BY cls
    """,
)
def orders_pareto_class(spark, sf_dir):
    """ABC / Pareto classification — "which customers are the 80%": rank
    customers by revenue descending and classify by CUMULATIVE revenue
    share (A ≤ 80%, B ≤ 95%, C the tail), the inventory-management
    cousin of the quartile segmentations. The interesting machinery is
    the global running sum: the oracle's bare ``SUM() OVER (ORDER BY)``
    is the same single-partition WindowExec trap the ntile family had,
    so the Spark side runs :func:`_global_cumsum` — range repartition,
    per-partition decimal prefix sums in parallel, bounded per-partition
    offset fix-up — proven equal to the plain window form by this very
    oracle. Class boundaries compare ``cum·100 ≤ total·80`` in exact
    DECIMAL arithmetic (no share-rounding at the boundary); the output
    share is one double division per class row."""
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec4("o_totalprice")).alias("r"))
    )
    c = _global_cumsum(rev, "r", F.desc("r"), F.col("o_custkey"))
    tot = rev.agg(F.sum("r").alias("tot"))
    cls = (
        c.crossJoin(F.broadcast(tot))
        .select(
            "r",
            F.when(
                F.col("cum") * 100 <= F.col("tot") * 80, "A"
            )
            .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
            .otherwise("C")
            .alias("cls"),
            "tot",
        )
    )
    return cls.groupBy(F.col("cls").alias("pareto_class")).agg(
        F.count("*").alias("n_customers"),
        money(F.sum("r")).alias("revenue"),
        F.round(
            F.sum("r").cast("double") / F.max("tot").cast("double"), 6
        ).alias("revenue_share"),
    )


_BIN_TARGET = 65536  # 64 KiB bins at fixture scale; 128-512 MiB in production


@query(
    "compaction_partition_bins",
    f"""
    WITH kp AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(16 + length(props) + length(event_type)) AS BIGINT)
               AS bytes
      FROM events GROUP BY 1
    ),
    kc AS (
      SELECT day, n_rows, bytes,
             CAST(sum(bytes) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM kp
    )
    SELECT CAST((cum - bytes) // {_BIN_TARGET} AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_partitions,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           min(day) AS first_day, max(day) AS last_day
    FROM kc GROUP BY 1
    """,
)
def compaction_partition_bins(spark, sf_dir):
    """Small-file compaction planning — the lakehouse maintenance op every
    day-partitioned 100 TB table needs: pack consecutive day partitions
    into target-size rewrite bins (here {_BIN_TARGET} bytes; 128-512 MiB
    in production) so a compactor can rewrite each bin as one file. The
    packing is the order-preserving form real compactors use (contiguous
    partitions share a bin — preserves partition pruning and sort order;
    bin-id = the bin in which the partition's byte range STARTS, so a
    partition that straddles a boundary joins its opening bin). Exactness:
    the size model 16 + len(props) + len(event_type) is an integer
    per-row estimate summed per day, the prefix sum is exact BIGINT, and
    bin assignment is one integer floor-division. Scale shape: the fact
    table reduces to |days| partition-stat rows in one partial-agg pass;
    the prefix sum runs on `_global_cumsum` (range repartition +
    per-partition running sum + bounded offset fix-up — NO
    single-partition window, unlike the oracle's plain SQL window); the
    bin rollup is a second tiny aggregation. The bin plan is exactly what
    a rewrite job consumes as its work list."""
    ev = load_events(spark, sf_dir)
    parts = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.lit(16) + F.length("props") + F.length("event_type")
        ).cast("long").alias("bytes"),
    )
    cum = _global_cumsum(parts, "bytes", "day")
    return (
        cum.withColumn(
            "bin_id", F.expr(f"(cum - bytes) DIV {_BIN_TARGET}").cast("long")
        )
        .groupBy("bin_id")
        .agg(
            F.count("*").cast("long").alias("n_partitions"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )
