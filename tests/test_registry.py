"""Registry-ordering invariants (driver grading-window contract).

The driver grades a prefix of the registry (round 1: the first 50 entries,
dict order). These tests pin the ordering guarantees that
``operators.registry()`` provides so a refactor can't silently push an
EXACT-oracle flagship out of the graded window or let an oracle-less query
burn a graded slot.
"""

from dataflow_pubsub_message_encryption_spark.operators import _WINDOW, registry

QUERIES, ORACLES = registry()
KEYS = list(QUERIES)

FLAGSHIPS = [
    "dedup_minhash_lsh_pairs",
    "corpus_clean_pipeline",
    "dedup_cluster_components",
    "sim_ann_lsh_topk",
    "cdc_upsert_latest",
    "cdc_scd2_intervals",
    "tpch_q4_order_priority",
    "tpch_q22_dormant_customers",
    "agg_approx_distinct",
    "udf_surface",
]


def test_window_is_exactly_the_declared_prefix():
    assert KEYS[: len(_WINDOW)] == _WINDOW


def test_window_holds_50_exact_oracle_queries():
    assert len(_WINDOW) == 50
    assert all(k in ORACLES for k in _WINDOW)


def test_flagships_inside_graded_window():
    for k in FLAGSHIPS:
        assert KEYS.index(k) < 50, f"{k} fell out of the graded window"


def test_every_exact_query_precedes_every_rows_query():
    tiers = [0 if k in ORACLES else 1 for k in KEYS]
    assert tiers == sorted(tiers), "an oracle-less query precedes an EXACT one"


def test_no_key_lost_by_reordering():
    assert len(KEYS) == len(set(KEYS))
    assert set(ORACLES) <= set(KEYS)
