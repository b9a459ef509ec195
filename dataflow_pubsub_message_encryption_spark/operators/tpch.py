"""CORE group extension — classic decision-support query shapes (TPC-H Q4,
Q7, Q10, Q12, Q13, Q14, Q16, Q18, Q19, Q22), adapted to the fixture schema.

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
by c_mktsegment instead of phone prefix.

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
