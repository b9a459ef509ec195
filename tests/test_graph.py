"""Connected-components behavior tests: exact agreement with a
union-find referee, canonical/size laws, convergence bound."""

from __future__ import annotations

from dataflow_pubsub_message_encryption_spark.operators.dedup import (
    QUERIES as DEDUP_QUERIES,
)
from dataflow_pubsub_message_encryption_spark.operators.graph import QUERIES


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark, sf_dir):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in DEDUP_QUERIES["dedup_minhash_lsh_pairs"](spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    ]
    assert pairs, "fixture corpus must contain near-dup pairs"
    referee = _union_find(pairs)
    # referee's root is path-compressed but not guaranteed min — normalize
    comp_min: dict[int, int] = {}
    for node, root in referee.items():
        comp_min[root] = min(comp_min.get(root, node), node)
    expect = {node: comp_min[root] for node, root in referee.items()}

    got_rows = QUERIES["dedup_cluster_components"](spark, sf_dir).collect()
    got = {r.doc_id: r.cluster_id for r in got_rows}
    assert got == expect

    # laws: canonical iff doc_id == cluster_id; sizes partition the nodes;
    # every cluster's canonical member is present
    sizes: dict[int, int] = {}
    for r in got_rows:
        sizes[r.cluster_id] = sizes.get(r.cluster_id, 0) + 1
        assert r.is_canonical == (r.doc_id == r.cluster_id)
        assert r.cluster_id <= r.doc_id
    for r in got_rows:
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.cluster_size >= 2  # every node here came from a pair
    assert set(sizes) == {
        min(n for n, c in got.items() if c == cid) for cid in sizes
    }


def test_star_contraction_long_path_log_rounds(spark):
    """A 512-node path graph is the adversarial case for min-label
    propagation (O(diameter) = 511 rounds); the large-star/small-star
    contraction must converge in O(log n) — assert <= ceil(log2 n) + 3."""
    import math

    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        connected_components,
    )

    n = 512
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a BIGINT, b BIGINT"
    )
    labels, rounds = connected_components(pairs)
    got = {r.node: r.lbl for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= math.ceil(math.log2(n)) + 3, f"took {rounds} rounds"


def test_star_contraction_multiple_components(spark):
    """Disjoint components keep distinct minima; singleton-free edge input
    (two triangles + one 4-chain + an isolated pair)."""
    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        connected_components,
    )

    edges = [
        (10, 11), (11, 12), (12, 10),          # triangle -> 10
        (20, 23), (23, 21), (21, 20),          # triangle -> 20
        (5, 6), (6, 7), (7, 8),                # chain -> 5
        (100, 99),                             # pair -> 99
    ]
    pairs = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
    labels, _ = connected_components(pairs)
    got = {r.node: r.lbl for r in labels.collect()}
    assert got == {
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20, 23: 20,
        5: 5, 6: 5, 7: 5, 8: 5,
        99: 99, 100: 99,
    }


def test_star_contraction_two_root_counterexample(spark):
    """Regression: the chained==0 stop alone is unsound — after one round
    of this graph, node 3 points at BOTH roots 0 and 2 while neither root
    is a source, so a target-is-source test sees a "star forest" and
    stops with the single component split into {0,3,5,8} and {2,4,6,7}.
    The stop must also require fan-out 1 per source."""
    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        connected_components,
    )

    edges = [(7, 3), (8, 3), (0, 5), (0, 8), (2, 4), (2, 6), (4, 7)]
    pairs = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
    labels, _ = connected_components(pairs)
    got = {r.node: r.lbl for r in labels.collect()}
    assert got == {n: 0 for n in (0, 2, 3, 4, 5, 6, 7, 8)}


def test_star_contraction_random_graphs_match_union_find(spark):
    """Property sweep: 20 seeded random graphs (the advisor's simulation
    found ~1.2% wrong labelings under the unsound stop) must all agree
    exactly with a union-find referee."""
    import random

    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        connected_components,
    )

    rng = random.Random(20260814)
    for _ in range(20):
        n = rng.randint(6, 40)
        m = rng.randint(n // 2, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        referee = _union_find(edges)
        comp_min: dict[int, int] = {}
        for node, root in referee.items():
            comp_min[root] = min(comp_min.get(root, node), node)
        expect = {node: comp_min[root] for node, root in referee.items()}
        pairs = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
        labels, _ = connected_components(pairs)
        got = {r.node: r.lbl for r in labels.collect()}
        assert got == expect, f"mismatch on edges={edges}"


def test_pagerank_int_laws(spark, sf_dir):
    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        QUERIES as GQ,
        _PR_SCALE,
    )

    rows = GQ["graph_pagerank_int"](spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    for r in rows:
        # teleport floor: rank >= 0.15 * scale always
        assert r.pr_scaled >= 150000
        assert r.degree >= 1
    # integer division only LOSES mass: total <= n * scale
    assert sum(r.pr_scaled for r in rows) <= n * _PR_SCALE
    # determinism by construction: a second run is bit-identical
    again = {r.doc_id: r.pr_scaled for r in GQ["graph_pagerank_int"](spark, sf_dir).collect()}
    assert again == {r.doc_id: r.pr_scaled for r in rows}


def test_pagerank_int_symmetric_star(spark):
    """On a 4-leaf star the hub must outrank every leaf and all leaves
    tie exactly (integer arithmetic: EXACT equality, no tolerance)."""
    from dataflow_pubsub_message_encryption_spark.operators import graph as G
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (1, 13)], "doc_a BIGINT, doc_b BIGINT"
    )
    orig = G._DEDUP_QUERIES["dedup_minhash_lsh_pairs"]
    G._DEDUP_QUERIES["dedup_minhash_lsh_pairs"] = lambda s, d: pairs
    try:
        got = {r.doc_id: r.pr_scaled for r in G.QUERIES["graph_pagerank_int"](spark, "unused").collect()}
    finally:
        G._DEDUP_QUERIES["dedup_minhash_lsh_pairs"] = orig
    hub, leaves = got[1], [got[k] for k in (10, 11, 12, 13)]
    assert len(set(leaves)) == 1
    assert hub > leaves[0]


def test_kcore_converged_and_degrees(spark, sf_dir):
    """graph_kcore_membership: on the fixtures the bounded peel reaches
    the true fixed point (converged flag), every member has core degree
    >= k, and members form a subset of the components node set."""
    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        QUERIES as GQ,
    )

    rows = GQ["graph_kcore_membership"](spark, sf_dir).collect()
    assert rows, "fixture duplicate graph has no 2-core"
    assert all(r.converged for r in rows)
    assert all(r.core_degree >= 2 for r in rows)
    comp_nodes = {
        r.doc_id for r in GQ["dedup_cluster_components"](spark, sf_dir).collect()
    }
    assert {r.doc_id for r in rows} <= comp_nodes


def test_label_propagation_splits_bridged_cliques(spark):
    """Two triangles joined by one bridge edge: ONE connected component but
    TWO LPA communities — the semantic difference the operator exists for.
    (Hand-simulated: sync LPA with (count DESC, min label) tie-break
    converges in 3 rounds to one label per triangle.)"""
    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)],
        ["doc_a", "doc_b"],
    )
    comp, _ = connected_components(pairs)
    assert len({r[1] for r in comp.collect()}) == 1, "bridge joins components"

    lab = {r.node: r.lab for r in label_propagation(pairs).collect()}
    a = {lab[0], lab[1], lab[2]}
    b = {lab[10], lab[11], lab[12]}
    assert len(a) == 1 and len(b) == 1, "each clique must agree internally"
    assert a != b, "bridged cliques must land in different communities"
