"""Iterative graph operator: connected components for duplicate clustering.

Pairwise near-dup detection (dedup.py) emits EDGES; a cleaning pipeline
needs GROUPS — "these 17 documents are all one thing, keep one". That is
connected components over the duplicate-pair graph, the step MinHash
pipelines (Spark MLlib's LSH, text-dedup toolchains) run after candidate
verification. It is also this engine's representative *iterative*
algorithm: a fixed-point loop the DataFrame API drives from plain joins.

Algorithm: min-label propagation. Every node starts labeled with itself;
each round every node takes the min label among itself and its neighbors;
at the fixed point every node carries the minimum doc_id of its component
(the canonical representative — deterministic, no tie-breaking needed).

Scale notes (100 TB):
- Each round is one shuffle join (edges ⋈ labels on the src key) + one
  groupBy-min — both partial-aggregating, ids-only payloads (16 bytes/row).
- Rounds needed = graph diameter. Near-dup components are dense (a dup
  family collides in every band), so diameters are tiny — the fixture
  graph's 199-node component converges in 3 rounds. For adversarial long
  chains the documented upgrade is the large-star/small-star contraction
  (O(log n) rounds, same join primitives).
- Lineage is truncated with an eager ``localCheckpoint`` per round —
  without it the plan doubles every iteration and Catalyst re-optimizes
  the whole history. On a cluster use ``checkpoint`` to HDFS instead.
- The ONLY driver-side data transfer is the one-scalar convergence check
  per round (sum of labels, strictly decreasing until fixed point). The
  label table itself never leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import make_registry
from .dedup import ORACLES as _DEDUP_ORACLES
from .dedup import QUERIES as _DEDUP_QUERIES

QUERIES, ORACLES, query = make_registry()

_MAX_ROUNDS = 15


@query(
    "dedup_cluster_components",
    f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_DEDUP_ORACLES["dedup_minhash_lsh_pairs"]})
    ),
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (
      SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size,
           doc_id = cluster_id AS is_canonical
    FROM comp
    """,
)
def dedup_cluster_components(spark, sf_dir):
    """Connected components over the MinHash-LSH verified duplicate-pair
    graph: each document that appears in any near-dup pair is assigned its
    component's canonical id (the component's minimum doc_id) plus the
    component size — the keep-one-per-group decision a corpus cleaner
    executes. Iterative min-label propagation with a per-round eager
    localCheckpoint; converges when the (monotonically decreasing) label
    sum stops changing. The EXACT oracle recomputes the same components in
    DuckDB via a recursive CTE — the full iterative fixed point is
    value-checked cross-engine, not just row counts."""
    pairs = _DEDUP_QUERIES["dedup_minhash_lsh_pairs"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("s", "d")
    edges = edges.localCheckpoint(eager=True)  # pairs are reused every round
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev = None
    for _ in range(_MAX_ROUNDS):
        # fixture graphs are broadcast-sized; at 100 TB drop the hint and
        # this is the standard shuffled join on the src key
        nbr = F.broadcast(edges).join(labels, edges.s == labels.node).select(
            F.col("d").alias("node"), "lbl"
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        total = labels.agg(F.sum("lbl").alias("t")).collect()[0].t  # driver-scalar
        if total == prev:
            break
        prev = total
    comp = labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return comp.join(F.broadcast(sizes), "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )
