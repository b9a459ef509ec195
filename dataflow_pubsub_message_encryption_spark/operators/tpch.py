"""CORE group extension — the full TPC-H suite of decision-support query
shapes, adapted to the fixture schema. All 22 are covered: Q1/Q3/Q5/Q17
live in relational.py (agg_hash_groupby, sql_entrypoint_q3,
join_multiway_q5, agg_correlated_subquery); Q2, Q4, Q6-Q16, Q18-Q22 are
here, each EXACT-oracle-checked.

The reference has no relational layer at all [U/H, SURVEY §2.1: a single
linear Beam pipeline — no joins, SQL, optimizer, sorts, or set ops]; these
rows widen the CORE substrate with the canonical analytics shapes a
warehouse engine is expected to answer: EXISTS/NOT-EXISTS decorrelation,
conditional aggregation, two-level aggregation, disjunctive join
predicates, IN-subquery against a grouped HAVING, and scalar-subquery
thresholds. Adaptations forced by the fixture schema (FIXTURES.md — no
partsupp, l_shipmode, l_commitdate, or c_phone): Q4's lateness predicate
uses l_shipdate vs o_orderdate; Q12 groups by l_returnflag instead of
shipmode; Q16 uses lineitem as the part↔supplier relation; Q22 segments
by c_mktsegment instead of phone prefix; Q2/Q11/Q20 derive part↔supplier
costs/quantities from lineitem; Q9's unit-cost term is l_tax*l_quantity;
Q21's lateness is ship > order date + 45 days.

Every query is EXACT-checked against DuckDB. Money math follows the
decimal discipline in functions/normalize.py: sums/products in
DECIMAL(18,4) (bit-exact cross-engine), rounded to 2dp double only on
output. Scale notes per docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.normalize import date_str, dec4, money
from ..sources import load
from .base import make_registry

QUERIES, ORACLES, query = make_registry()

def _revenue():
    # Column exprs need a live session; build lazily inside each query.
    return dec4("l_extendedprice") * (1 - dec4("l_discount"))


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
)


@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """Q4 shape — EXISTS over the fact table decorrelated to a left-semi
    join. The date filter pushes into the orders scan BEFORE the join, so
    the semi join probes only the 6-month slice; lineitem is never
    aggregated, only semi-probed (no payload columns shuffle — just the
    join key + the two date columns in the condition)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "tpch_q7_nation_volume",
    f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           CAST(round(SUM({_REVENUE_SQL.replace("l_", "l.l_")}), 2) AS DOUBLE)
             AS revenue
    FROM lineitem l
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7_nation_volume(spark, sf_dir):
    """Q7 shape — bilateral trade volume by (supplier nation, customer
    nation, year). nation and supplier broadcast (25 / 0.1%-of-fact rows);
    the disjunctive nation-pair filter applies after the broadcast joins
    but Catalyst pushes each branch's single-nation predicate into the
    broadcast build sides. Only lineitem⋈orders⋈customer shuffle, each on
    its own key; the group-by output is ~2 pairs x years — map-side
    partial aggregation collapses the shuffle to nothing."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(ns, s.s_nationkey == F.col("s_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return pair.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
    ).agg(money(F.sum(_revenue())).alias("revenue"))


@query(
    "tpch_q10_returned_revenue",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(SUM({_REVENUE_SQL.replace("l_", "l.l_")}), 2) AS DOUBLE)
             AS revenue
    FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY SUM({_REVENUE_SQL.replace("l_", "l.l_")}) DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_revenue(spark, sf_dir):
    """Q10 shape — top-20 customers by returned-item revenue in a quarter.
    Both filters (date on orders, returnflag on lineitem) push into their
    scans before the joins; nation broadcasts. The ORDER BY ranks on the
    exact DECIMAL sum (identical cross-engine) with c_custkey tie-break,
    so the LIMIT-20 row set is deterministic; TakeOrderedAndProject keeps
    only 20 rows per partition through the final exchange."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).alias("rev_exact"))
    )
    return (
        agg.orderBy(F.desc("rev_exact"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", money("rev_exact").alias("revenue"))
    )


@query(
    "tpch_q12_late_shipment_priority",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_late_shipment_priority(spark, sf_dir):
    """Q12 shape — conditional two-way counts (urgent vs not) of
    late-shipped lineitems per returnflag. The lateness predicate spans
    both tables so it evaluates post-join, but the year filter still
    prunes orders at the scan. Map-side partial aggregation reduces the
    final shuffle to 3 groups x 2 counters."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey)
               & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_custdist",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def tpch_q13_custdist(spark, sf_dir):
    """Q13 shape — distribution of customers by order count. Two-level
    aggregation: the first groups on the join key (so AQE can fold it
    into the join's existing hash partitioning — no second shuffle of the
    wide data), the second shuffles only (c_count, partial count) pairs,
    bounded by the max order multiplicity, not the customer count."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q14_promo_revenue",
    f"""
    SELECT round(
      100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                            THEN {_REVENUE_SQL.replace("l_", "l.l_")} END) AS DOUBLE)
            / CAST(SUM({_REVENUE_SQL.replace("l_", "l.l_")}) AS DOUBLE),
      6) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-04-01'
      AND l.l_shipdate < TIMESTAMP '1996-05-01'
    GROUP BY ALL
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """Q14 shape — promo revenue share in one month. part broadcasts
    (20k rows at sf0.1; at 100 TB it exceeds the threshold and AQE picks
    shuffled-hash — the query text doesn't change). Both conditional and
    total sums accumulate in exact DECIMAL, so the double division is
    computed over identical operands in both engines; rounded to 6dp."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-04-01") & (F.col("l_shipdate") < "1996-05-01")
    )
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", _revenue())).cast("double")
            / F.sum(_revenue()).cast("double"),
            6,
        ).alias("promo_revenue")
    )


@query(
    "tpch_q16_supplier_census",
    """
    SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 14, 23, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
)
def tpch_q16_supplier_census(spark, sf_dir):
    """Q16 shape — distinct-supplier census per (brand, type) with a
    NOT-IN exclusion list. lineitem stands in for partsupp (the fixture
    has none). NOT IN over the non-null key column is expressed as a
    left-anti join against the (tiny, broadcast) bad-supplier list —
    identical semantics, no null trap. The selective part predicate
    (4 of 50 sizes) broadcasts a pruned build side; count(DISTINCT)
    expands to the standard two-phase distinct aggregation."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    li = load(spark, sf_dir, "lineitem")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q18_large_volume_orders",
    """
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_odate,
           CAST(round(CAST(o.o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS o_totalprice,
           CAST(round(SUM(CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_qty
    FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def tpch_q18_large_volume_orders(spark, sf_dir):
    """Q18 shape — large-volume orders via IN over a grouped HAVING.
    The inner aggregate runs first (shuffle on l_orderkey, map-side
    partial sums), yields a tiny key set (~50 of 15k orders at sf0.01)
    that broadcasts as a semi-join filter into the outer join tree — the
    classic aggregate-then-semi-reduce plan that survives scale because
    the big side is filtered before the customer join."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec4("l_quantity")).alias("qty_exact"))
        .filter(F.col("qty_exact") > 300)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            date_str("o_orderdate").alias("o_odate"),
            money(dec4("o_totalprice")).alias("o_totalprice"),
            money("qty_exact").alias("sum_qty"),
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    f"""
    SELECT CAST(round(SUM({_REVENUE_SQL.replace("l_", "l.l_")}), 2) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 25 AND 50)
    GROUP BY ALL
    """,
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """Q19 shape — disjunctive multi-attribute join predicate. Catalyst
    extracts the common conjuncts per side: a brand IN (1,2,3)-ish filter
    pushes into the part scan and a quantity range into lineitem, so the
    OR only evaluates on pre-filtered rows; the join itself stays a plain
    equi-join on partkey (broadcast here) rather than a nested-loop."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(25, 50))
    )
    return j.filter(branch).agg(money(F.sum(_revenue())).alias("revenue"))


@query(
    "tpch_q22_dormant_customers",
    """
    SELECT c.c_mktsegment, count(*) AS numcust,
           CAST(round(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c
    WHERE CAST(c.c_acctbal AS DECIMAL(18,4))
            * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-08-01')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_q22_dormant_customers(spark, sf_dir):
    """Q22 shape — above-average-balance customers with no recent orders,
    per market segment. The average test is expressed cross-multiplied
    (acctbal * n > total) so both engines compare exact DECIMALs — a
    double avg() would round differently at the boundary. The 1-row
    (n, total) aggregate broadcasts under every row's filter; recency is
    a left-anti join against date-pruned orders (NOT EXISTS)."""
    c = load(spark, sf_dir, "customer")
    stats = F.broadcast(
        c.filter(F.col("c_acctbal") > 0).agg(
            F.count("*").alias("n_pos"),
            F.sum(dec4("c_acctbal")).alias("total_pos"),
        )
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-08-01"
    ).select("o_custkey")
    return (
        c.crossJoin(stats)
        .filter(dec4("c_acctbal") * F.col("n_pos") > F.col("total_pos"))
        .join(recent, c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            money(F.sum(dec4("c_acctbal"))).alias("totacctbal"),
        )
    )


# --- round 2: the remaining TPC-H shapes (full 22-query suite) ---------------
# Fixture adaptations (no partsupp / l_commitdate / c_phone — FIXTURES.md):
# Q2/Q11/Q20 derive the part<->supplier relation and its costs/quantities
# from lineitem; Q9's profit uses l_tax*l_quantity as the unit-cost term;
# Q21's lateness is l_shipdate > o_orderdate + 45 days. Shapes preserved.


@query(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """Q6 shape — pure scan-side aggregation: every predicate pushes into
    the parquet scan (date range, discount band, quantity cap), then a
    single global decimal sum. The canonical 'filters reach the scan' probe
    — zero joins, zero wide shuffles, one scalar out."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(money(F.sum(dec4("l_extendedprice") * dec4("l_discount"))).alias("revenue"))


_Q2_COST = """
    SELECT l.l_partkey, l.l_suppkey,
           min(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS c
    FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE r.r_name = 'ASIA' AND p.p_size <= 10 AND p.p_type = 'LARGE'
    GROUP BY 1, 2
"""


@query(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH cost AS ({_Q2_COST})
    SELECT c.l_partkey AS p_partkey, s.s_name,
           CAST(round(c.c, 2) AS DOUBLE) AS cost
    FROM cost c JOIN supplier s ON s.s_suppkey = c.l_suppkey
    WHERE c.c = (SELECT min(c2.c) FROM cost c2
                 WHERE c2.l_partkey = c.l_partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape — minimum-cost supplier per part within a region, i.e. a
    correlated MIN subquery decorrelated to aggregate + self-join (fixture
    adaptation: the part<->supplier cost relation derives from lineitem's
    observed min price, standing in for partsupp.ps_supplycost). All four
    dimension joins broadcast; the only fact shuffle is the (part, supp)
    group-by, and the per-part min re-joins on the already-partitioned
    part key. Decimal min keeps the equality comparison bit-exact."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    region_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(region_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(dec4("l_extendedprice")).alias("c"))
    )
    part_min = cost.groupBy("l_partkey").agg(F.min("c").alias("c_min"))
    return (
        cost.join(F.broadcast(part_min), "l_partkey")
        .filter(F.col("c") == F.col("c_min"))
        .join(F.broadcast(region_supp), cost.l_suppkey == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            money(F.col("c")).alias("cost"),
        )
    )


@query(
    "tpch_q8_market_share",
    f"""
    SELECT year(o.o_orderdate) AS o_year,
           round(CAST(SUM(CASE WHEN ns.n_name = 'NATION_1'
                          THEN {_REVENUE_SQL.replace("l_", "l.l_")}
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({_REVENUE_SQL.replace("l_", "l.l_")}) AS DOUBLE), 6)
             AS mkt_share
    FROM lineitem l
      JOIN part p      ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
      JOIN region r    ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'EUROPE'
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8 shape — national market share: one nation's revenue fraction of a
    region's market for one part type, by order year. The conditional-sum /
    total-sum ratio computes both aggregates in a single pass (one partial
    agg, no second scan); 7-table tree with every dimension broadcast, so
    lineitem⋈orders is the only real shuffle. Decimal sums -> double
    division -> 6dp keeps the ratio bit-stable cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nc = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("c_nk")
    )
    ns = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    rev = _revenue()
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("c_nk"), "inner")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("s_nk"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(zero))
            .cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "tpch_q9_product_profit",
    f"""
    SELECT ns.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(SUM({_REVENUE_SQL.replace("l_", "l.l_")}
                          - CAST(l.l_tax AS DECIMAL(18,4))
                            * CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS profit
    FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9 shape — product-line profit by supplier nation and year (fixture
    adaptation: the supplycost*qty term becomes l_tax*l_quantity — no
    partsupp). The LIKE-filtered part dim broadcasts and prunes lineitem
    BEFORE the orders join; profit arithmetic stays in decimal end to
    end."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    profit = _revenue() - dec4("l_tax") * dec4("l_quantity")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(money(F.sum(profit)).alias("profit"))


_Q11_VALUE = """
    SELECT l.l_partkey,
           SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(l.l_quantity AS DECIMAL(18,4))) AS val
    FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_1'
    GROUP BY 1
"""


@query(
    "tpch_q11_important_stock",
    f"""
    WITH pv AS ({_Q11_VALUE})
    SELECT l_partkey AS p_partkey, CAST(round(val, 2) AS DOUBLE) AS value
    FROM pv
    WHERE CAST(val AS DOUBLE) >
          0.001 * (SELECT CAST(SUM(val) AS DOUBLE) FROM pv)
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 shape — parts representing a significant fraction of one
    nation's total traded value: group-by + scalar-subquery threshold
    (fixture adaptation: value = sum(extendedprice*quantity) over that
    nation's lineitems, standing in for supplycost*availqty). The scalar
    total broadcasts via a 1-row cross join; the per-part value table is
    computed ONCE and reused for both sides (no second scan)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    pv = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec4("l_extendedprice") * dec4("l_quantity")).alias("val"))
    )
    total = pv.agg(F.sum("val").cast("double").alias("tot"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > 0.001 * F.col("tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            money(F.col("val")).alias("value"),
        )
    )


_Q15_REV = """
    SELECT l_suppkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
"""


@query(
    "tpch_q15_top_supplier",
    f"""
    WITH rev AS ({_Q15_REV})
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15 shape — supplier(s) achieving the quarter's maximum revenue:
    aggregate once, compare against the broadcast scalar max (ALL maxima
    returned — ties included — so the result set is deterministic without
    a LIMIT). Decimal equality makes the tie comparison bit-exact, which a
    double sum could not guarantee."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", money(F.col("total_revenue")).alias("total_revenue"))
    )


@query(
    "tpch_q20_dominant_supplier",
    f"""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'blue%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh
      JOIN supplier s ON s.s_suppkey = sh.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_2'
    WHERE CAST(sh.qty AS DOUBLE) > 0.5 * (
      SELECT CAST(SUM(sh2.qty) AS DOUBLE) FROM shipped sh2
      WHERE sh2.l_partkey = sh.l_partkey)
    """,
)
def tpch_q20_dominant_supplier(spark, sf_dir):
    """Q20 shape — suppliers of one nation who dominated a part's yearly
    volume (>50% of all shipments of that part): nested correlated
    subqueries decorrelated to two aggregates joined on the part key
    (fixture adaptation: shipped quantity from lineitem stands in for
    partsupp availability). The name-filtered part dim broadcasts; the
    (part, supplier) aggregate is computed once and reused for the
    per-part total — same single-pass discipline as Q11."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec4("l_quantity")).alias("qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").cast("double").alias("tot"))
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        shipped.join(F.broadcast(tot), "l_partkey")
        .filter(F.col("qty").cast("double") > 0.5 * F.col("tot"))
        .join(F.broadcast(nat_supp), shipped.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "tpch_q21_waiting_orders",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
      JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_orders(spark, sf_dir):
    """Q21 shape — suppliers who alone held up multi-supplier orders:
    EXISTS (another supplier participated) + NOT EXISTS (another supplier
    was also late), the classic double-decorrelation (fixture adaptation:
    late = shipped >45 days after the order date — no l_commitdate/
    l_receiptdate). Spark side decorrelates BOTH subqueries into one
    order-level aggregate (distinct supplier count, distinct late-supplier
    count) joined back to the late rows — two shuffles total, versus the
    semi+anti double probe of the literal form; the oracle keeps the
    EXISTS form, so the gate also proves the rewrite equivalent."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    )
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
    )
    late_per_order = (
        late.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_late"))
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    waiting = (
        late.join(per_order, "l_orderkey")
        .join(late_per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(F.broadcast(nat_supp), waiting.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "supplier_hhi_concentration",
    """
    WITH s AS (
      SELECT n.n_name,
             l.l_suppkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem l
      JOIN supplier su ON su.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = su.s_nationkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT n_name, SUM(rev) AS trev, count(*) AS n_suppliers
            FROM s GROUP BY 1)
    SELECT s.n_name AS nation,
           CAST(max(tot.n_suppliers) AS BIGINT) AS n_suppliers,
           CAST(round(max(tot.trev), 2) AS DOUBLE) AS revenue,
           CAST(SUM(((CAST(s.rev * 10000 AS BIGINT) * 1000000)
                      // CAST(tot.trev * 10000 AS BIGINT))
                    * ((CAST(s.rev * 10000 AS BIGINT) * 1000000)
                       // CAST(tot.trev * 10000 AS BIGINT)))
                AS BIGINT) AS hhi_ppm2
    FROM s JOIN tot USING (n_name)
    GROUP BY s.n_name
    """,
)
def supplier_hhi_concentration(spark, sf_dir):
    """Herfindahl–Hirschman supplier-concentration index per nation — the
    antitrust/supply-risk number ('is this nation's supply one mega
    vendor or many small ones'): HHI = Σ share², shares in parts-per-
    million so the squares sum as exact integers (floor-divided 1e6-
    scaled decimal revenue; both engines run identical integer
    arithmetic — no float shares, no rounding boundary). 10^12 = full
    monopoly. Shapes: one (nation, supplier) decimal aggregate off the
    fact join (dims broadcast), nation totals re-broadcast, ≤|nations|
    output rows."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(F.sum(dec4("l_extendedprice")).alias("rev"))
    )
    tot = s.groupBy("n_name").agg(
        F.sum("rev").alias("trev"), F.count("*").alias("n_suppliers")
    )
    # scale BOTH operands to exact scale-4 integer units before the
    # floor-div: CAST(decimal AS BIGINT) truncates in Spark but rounds in
    # DuckDB, so the denominator must never cast a fractional decimal
    share_ppm = F.expr(
        "(CAST(rev * 10000 AS BIGINT) * 1000000)"
        " DIV CAST(trev * 10000 AS BIGINT)"
    )
    return (
        s.join(F.broadcast(tot), "n_name")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            money(F.max("trev")).alias("revenue"),
            F.sum(share_ppm * share_ppm).cast("long").alias("hhi_ppm2"),
        )
    )
