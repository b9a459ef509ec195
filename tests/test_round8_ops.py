"""Law tests for the round-8 operators — fixture-level invariants the
EXACT oracle gate cannot express (cross-operator consistency, structural
guarantees, documented-weakness demonstrations)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_suffix_array_brackets_the_ladder(spark, sf_dir):
    """`dedup_span_suffix_array` is exact at arbitrary lengths; the
    ladder reports the largest power-of-two rung. Consistency law, per
    doc: rung <= exact_span, and while the exact span is under the cap,
    exact_span < 2*rung (else the next rung would have fired). The zero
    cases must agree exactly: no rung <=> exact span < 8."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import QUERIES as DQ

    sa = {
        r.doc_id: r.max_shared_span
        for r in DQ["dedup_span_suffix_array"](spark, sf_dir).collect()
    }
    lad = {
        r.doc_id: r.max_shared_span
        for r in DQ["dedup_span_suffix_ladder"](spark, sf_dir).collect()
    }
    assert set(sa) == set(lad)
    for d, exact in sa.items():
        rung = lad[d]
        if rung == 0:
            assert exact < 8, f"doc {d}: ladder missed an {exact}-char span"
        else:
            assert rung <= exact, f"doc {d}: rung {rung} > exact {exact}"
            if exact < 64:
                assert exact < 2 * rung, (
                    f"doc {d}: exact {exact} implies rung >= {rung * 2}"
                )


def test_fingerprint_lanes_cover_each_other(spark):
    """The XOR lane cancels on pairwise-duplicated rows (documented
    weakness); the additive lane does not — together with the count they
    cover each other. Built directly on the _fp_nibbles helper."""
    from dataflow_pubsub_message_encryption_spark.operators.curation import (
        _FP_MOD,
        _fp_nibbles,
    )

    rows = [(i, f"payload-{i}") for i in range(100)]
    base = spark.createDataFrame(rows, ["k", "v"])
    doubled = spark.createDataFrame(rows + rows, ["k", "v"])
    mutated = spark.createDataFrame(
        [(k, v if k != 50 else "payload-XX") for k, v in rows], ["k", "v"]
    )

    def lanes(df):
        fp = df.select(
            _fp_nibbles(F.sha2(F.concat_ws("|", "k", "v"), 256)).alias("fp")
        )
        r = fp.agg(
            F.expr("bit_xor(fp)").alias("x"),
            (F.sum(F.col("fp").cast("decimal(38,0)")) % F.lit(_FP_MOD)).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        return r.x, int(r.s), r.n

    bx, bs, bn = lanes(base)
    dx, ds, dn = lanes(doubled)
    mx, ms, mn_ = lanes(mutated)
    assert dx == 0 or dx != bx  # XOR of each row twice cancels to 0
    assert dx == 0, "pairwise duplication must cancel the XOR lane"
    assert (ds, dn) != (bs, bn), "additive lane + count must catch doubling"
    assert mx != bx and ms != bs, "a single-row mutation must move both lanes"
    # determinism: same input, same lanes
    assert lanes(base) == (bx, bs, bn)


def test_bm25_ranks_and_hits(spark, sf_dir):
    """BM25 top-10 structural laws: ranks are 1..10, integer scores
    non-increasing with rank, every hit matched >= 1 query term, and the
    underlying per-doc aggregate only contains docs with hits."""
    from dataflow_pubsub_message_encryption_spark.operators.text import (
        _BM25_TERMS,
        _bm25_doc_scores,
        QUERIES as TQ,
    )

    top = TQ["text_bm25_topk"](spark, sf_dir).collect()
    assert [r.rk for r in sorted(top, key=lambda r: r.rk)] == list(range(1, 11))
    by_rank = sorted(top, key=lambda r: r.rk)
    assert all(
        a.bm25 >= b.bm25 for a, b in zip(by_rank, by_rank[1:])
    ), "score must be non-increasing in rank"
    assert all(1 <= r.n_terms_hit <= len(_BM25_TERMS) for r in top)
    agg = _bm25_doc_scores(spark, sf_dir)
    assert agg.filter(F.col("n_terms_hit") < 1).count() == 0


def test_rrf_score_recomputes_from_ranks(spark, sf_dir):
    """The fused RRF integer score must equal the closed form
    round(1e12/(60+r)) summed over the present modalities (rank 0 =
    absent = contributes nothing)."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
    )

    def term(r):
        return round(1_000_000_000_000.0 / (60 + r)) if r > 0 else 0

    for row in SQ["sim_hybrid_rrf_retrieval"](spark, sf_dir).collect():
        assert row.rrf_e12 == term(row.lex_rank) + term(row.vec_rank), row


def test_hard_negatives_are_wrong_label_and_ordered(spark, sf_dir):
    """Every mined negative carries a different label than its anchor;
    per anchor, ranks are 1..k and distance is non-decreasing in rank
    with id tie-break."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
    )

    rows = SQ["emb_hard_negative_mining"](spark, sf_dir).collect()
    by_anchor = {}
    for r in rows:
        assert r.anchor_label != r.neg_label, r
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for a, rs in by_anchor.items():
        rs.sort(key=lambda r: r.hn_rank)
        assert [r.hn_rank for r in rs] == list(range(1, len(rs) + 1))
        keys = [(r.idist, r.neg_id) for r in rs]
        assert keys == sorted(keys), f"anchor {a}: order violates (idist, id)"


def test_phash_finds_exact_content_dupes(spark, sf_dir):
    """Identical payloads have identical hashes, so every exact-content
    duplicate pair MUST appear with hamming 0 (band equality is trivial);
    and every reported pair respects the threshold + canonical order."""
    from dataflow_pubsub_message_encryption_spark.operators.multimodal import (
        _PH_TAU,
        QUERIES as MQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in MQ["multimodal_phash_hamming"](spark, sf_dir).collect()
    }
    assert all(a < b for a, b in got)
    assert all(0 <= h <= _PH_TAU for h in got.values())
    docs = load(spark, sf_dir, "documents")
    dup = (
        docs.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .collect()
    )
    for grp in dup:
        ids = sorted(grp.ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert got.get((ids[i], ids[j])) == 0, (
                    f"exact dup {ids[i]},{ids[j]} missed or nonzero"
                )
    # exact-content dups only exist at some SFs (none at sf0.001); the
    # detector itself must still fire on the near-dup population
    assert got, "no pairs within the Hamming radius — threshold drifted"


def test_mad_flags_satisfy_integer_threshold(spark, sf_dir):
    """Every flagged (type, day) satisfies the exact integer criterion
    and reports a robust z >= 2 (when MAD > 0)."""
    from dataflow_pubsub_message_encryption_spark.operators.behavior import (
        QUERIES as BQ,
    )

    rows = BQ["events_anomaly_mad"](spark, sf_dir).collect()
    assert rows, "fixture produced no MAD anomalies — threshold drifted"
    for r in rows:
        ad = abs(r.cnt - r.med)
        assert ad * 10000 > 29652 * r.mad, r
        if r.mad > 0:
            assert r.robust_z >= 2.0, r


def test_column_profile_key_uniqueness_law(spark, sf_dir):
    """The profile must prove o_orderkey is a key (distinct == rows,
    zero nulls) — the contract check the op exists to feed."""
    from dataflow_pubsub_message_encryption_spark.operators.curation import (
        QUERIES as CQ,
    )

    prof = {r.column_name: r for r in CQ["dq_column_profile"](spark, sf_dir).collect()}
    ok = prof["o_orderkey"]
    assert ok.n_nulls == 0 and ok.n_distinct == ok.n_rows
    # money/date lanes populated, string lanes null — and vice versa
    assert prof["o_totalprice"].min_int is not None
    assert prof["o_orderstatus"].min_str is not None
    assert prof["o_orderstatus"].min_int is None


def test_partition_fingerprints_roll_up_to_table_grain(spark, sf_dir):
    """The per-day fingerprint rows are mergeable summaries: their counts
    sum to the events row count, and folding the day XOR lanes together
    equals the whole-table XOR computed directly."""
    from functools import reduce

    from dataflow_pubsub_message_encryption_spark.operators.curation import (
        QUERIES as CQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load_events

    days = CQ["dq_partition_fingerprint_drill"](spark, sf_dir).collect()
    total = load_events(spark, sf_dir).count()
    assert sum(r.n_rows for r in days) == total
    folded = reduce(lambda a, b: a ^ b, (r.xor_fp for r in days), 0)
    # recompute the whole-table XOR from the same canonicalization by
    # removing the groupBy — one aggregate over the same fp column
    import dataflow_pubsub_message_encryption_spark.operators.curation as cu

    ev = load_events(spark, sf_dir)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    row = F.concat_ws(
        "|",
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        (F.col("value").cast("decimal(18,4)") * 10000).cast("long"),
        micros,
        F.col("props"),
    )
    whole = (
        ev.select(cu._fp_nibbles(F.sha2(row, 256)).alias("fp"))
        .agg(F.expr("bit_xor(fp)"))
        .collect()[0][0]
    )
    assert folded == whole


def test_ivf_cell_balance_partitions_the_corpus(spark, sf_dir):
    """Cell populations partition the vector set (sum = |V|), balance
    factors average to ~1 by construction, and purity is a valid
    fraction."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    rows = SQ["emb_ivf_cell_balance"](spark, sf_dir).collect()
    nv = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == nv
    k = len(rows)
    mean_bal = sum(r.balance_factor for r in rows) / k
    assert abs(mean_bal - 1.0) < 0.2, f"balance factors off: mean {mean_bal}"
    assert all(0 < r.label_purity <= 1.0 for r in rows)


def test_kneser_ney_beats_addone_on_training_set(spark, sf_dir):
    """Sanity law from LM theory: on the training corpus itself, the
    KN-smoothed per-doc mean negative logprob should on average be lower
    (better) than the add-one bigram scorer's — add-one steals far more
    mass from seen events."""
    from dataflow_pubsub_message_encryption_spark.operators.text import (
        QUERIES as TQ,
    )

    kn = {
        r.doc_id: r.kn_neg_logprob
        for r in TQ["text_kneser_ney_logprob"](spark, sf_dir).collect()
    }
    addone = {
        r.doc_id: r.avg_neg_logprob
        for r in TQ["text_bigram_logprob"](spark, sf_dir).collect()
    }
    common = set(kn) & set(addone)
    assert common
    mean_kn = sum(kn[d] for d in common) / len(common)
    mean_a1 = sum(addone[d] for d in common) / len(common)
    assert mean_kn < mean_a1, (mean_kn, mean_a1)


def test_conductance_volume_identity(spark, sf_dir):
    """Per community: volume = 2·internal_edges + cut_edges (every edge
    endpoint is either inside with its mate or a cut endpoint), and
    conductance is in [0, 1] when defined."""
    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        QUERIES as GQ,
    )

    rows = GQ["graph_community_conductance"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.volume == 2 * r.internal_edges + r.cut_edges, r
        if r.conductance is not None:
            assert 0.0 <= r.conductance <= 1.0, r


def test_prf_expands_past_the_plain_query(spark, sf_dir):
    """PRF law: the expanded query can only raise n_terms_hit (the plain
    3 query terms are a subset of the expanded set), and the expanded
    top-10 must actually use expansion terms somewhere (max hits above
    the plain query's ceiling — otherwise the feedback stage mined
    nothing and the op degenerates)."""
    from dataflow_pubsub_message_encryption_spark.operators.text import (
        _BM25_TERMS,
        QUERIES as TQ,
    )

    prf = TQ["text_bm25_prf_expansion"](spark, sf_dir).collect()
    assert max(r.n_terms_hit for r in prf) > len(_BM25_TERMS), (
        "no expansion term ever matched — feedback stage is inert"
    )
    assert all(r.n_terms_hit <= len(_BM25_TERMS) + 5 for r in prf)


def test_acf_is_bounded_and_sign_consistent(spark, sf_dir):
    """ACF is a Pearson correlation: |acf| <= 1 wherever defined, its sign
    matches the exact integer covariance numerator, and every (type, lag)
    row's pair count is positive (zero-pair lags emit no row)."""
    from dataflow_pubsub_message_encryption_spark.operators.behavior import QUERIES as BQ

    rows = BQ["events_acf_lags"](spark, sf_dir).collect()
    assert rows, "ACF produced no rows"
    for r in rows:
        assert 1 <= r.lag <= 7
        assert r.n_pairs > 0
        if r.acf is not None:
            assert -1.0 <= r.acf <= 1.0, f"{r.event_type} lag {r.lag}: {r.acf}"
            if r.cov_num > 0:
                assert r.acf >= 0
            elif r.cov_num < 0:
                assert r.acf <= 0


def test_ewma_matches_python_referee(spark, sf_dir):
    """Full referee: recompute the dyadic EWMA from the daily cells in
    plain Python (weights 2^(9-k) over present days) and require the
    integer numerator/denominator to match exactly, row for row."""
    from dataflow_pubsub_message_encryption_spark.operators.behavior import QUERIES as BQ
    from dataflow_pubsub_message_encryption_spark.sources import load_events
    import datetime

    ev = load_events(spark, sf_dir)
    cells = {
        (r.event_type, r.day): r.cnt
        for r in ev.groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    got = BQ["events_ewma_daily"](spark, sf_dir).collect()
    assert len(got) == len(cells)
    for r in got:
        day = datetime.date.fromisoformat(r.day)
        num = den = 0
        for k in range(10):
            c = cells.get((r.event_type, day - datetime.timedelta(days=k)))
            if c is not None:
                w = 1 << (9 - k)
                num += c * w
                den += w
        assert (r.ewma_num, r.ewma_den) == (num, den), (r.event_type, r.day)
        assert den >= 512  # the anchor day itself always contributes 2^9


def test_nprobe_curve_is_monotone(spark, sf_dir):
    """Candidate-set nesting law: recall@k and candidate volume are both
    non-decreasing in nprobe, and recall is a valid ratio."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
    )

    rows = sorted(
        SQ["sim_ann_ivf_nprobe_curve"](spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 3, 5]
    for a, b in zip(rows, rows[1:]):
        assert b.n_cand >= a.n_cand
        assert b.n_hit >= a.n_hit
        assert b.recall_at_k >= a.recall_at_k
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hit <= r.n_probes * 5


def test_compaction_bins_conserve_and_order(spark, sf_dir):
    """Conservation + contiguity laws: bin totals sum back to the per-day
    partition stats exactly; bin day ranges are disjoint and ordered by
    bin_id; every partition lands in exactly one bin."""
    from dataflow_pubsub_message_encryption_spark.operators.scale import QUERIES as KQ
    from dataflow_pubsub_message_encryption_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    truth = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.lit(16) + F.length("props") + F.length("event_type")).alias(
                "bytes"
            ),
        )
        .agg(F.count("*"), F.sum("n_rows"), F.sum("bytes"))
        .collect()[0]
    )
    bins = sorted(
        KQ["compaction_partition_bins"](spark, sf_dir).collect(),
        key=lambda r: r.bin_id,
    )
    assert sum(r.n_partitions for r in bins) == truth[0]
    assert sum(r.n_rows for r in bins) == truth[1]
    assert sum(r.total_bytes for r in bins) == truth[2]
    for r in bins:
        assert r.first_day <= r.last_day
    for a, b in zip(bins, bins[1:]):
        assert a.bin_id < b.bin_id
        assert a.last_day < b.first_day, "bin day ranges overlap"


def test_freshness_lag_reference_clock(spark, sf_dir):
    """At least one type sits AT the high-water mark (lag 0), no lag is
    negative, and the stale flag is the exact 24 h threshold in
    microseconds."""
    from dataflow_pubsub_message_encryption_spark.operators.curation import (
        QUERIES as CQ,
    )

    rows = CQ["dq_freshness_lag"](spark, sf_dir).collect()
    assert rows
    assert any(r.lag_us == 0 for r in rows), "no type at the global max"
    for r in rows:
        assert r.lag_us >= 0
        assert r.is_stale == (1 if r.lag_us > 86_400_000_000 else 0)


def test_dow_index_averages_to_one(spark, sf_dir):
    """Weighted by day counts, the seasonality indices average to exactly
    1 (Σ d_w·idx_w / D = 1 by construction); each index is positive and
    the 7 ISO weekdays are all present."""
    from dataflow_pubsub_message_encryption_spark.operators.behavior import QUERIES as BQ

    rows = BQ["orders_dow_seasonality_index"](spark, sf_dir).collect()
    assert sorted(r.dow for r in rows) == [1, 2, 3, 4, 5, 6, 7]
    tot_days = sum(r.n_days for r in rows)
    tot_unit = sum(r.gmv_unit for r in rows)
    for r in rows:
        assert r.dow_index > 0
        exact = (r.gmv_unit * tot_days) / (r.n_days * tot_unit)
        assert abs(r.dow_index - exact) < 5e-7
    wmean = sum(r.n_days * r.dow_index for r in rows) / tot_days
    assert abs(wmean - 1.0) < 1e-4


def test_elbow_inertia_decreases_with_k(spark, sf_dir):
    """More cells fit the data at least as well: inertia at k=8 must not
    exceed inertia at k=2, every inertia is non-negative, and all runs
    cover the full corpus."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
    )

    rows = {r.k: r for r in SQ["emb_kmeans_elbow_curve"](spark, sf_dir).collect()}
    assert sorted(rows) == [2, 4, 8]
    n = {r.n_vecs for r in rows.values()}
    assert len(n) == 1, "k runs disagree on corpus size"
    for r in rows.values():
        assert r.inertia_ppm >= 0
    assert rows[8].inertia_ppm <= rows[2].inertia_ppm


def test_interval_overlap_binning_is_lossless(spark, sf_dir):
    """The bin-then-verify construction must equal the naive θ-join: a
    Python referee intersects every (session, window) pair directly and
    the per-day aggregates must match exactly."""
    from collections import defaultdict

    from dataflow_pubsub_message_encryption_spark.operators.behavior import (
        QUERIES as BQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load_events
    import datetime

    ev = load_events(spark, sf_dir)
    events = ev.select("user_id", "ts", "event_id").collect()
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append((r.ts, r.event_id))
    sessions = []
    for u, rows in by_user.items():
        rows.sort()
        start = end = None
        for ts, _ in rows:
            if end is not None and (ts - end) <= datetime.timedelta(minutes=30):
                end = ts
            else:
                if start is not None:
                    sessions.append((u, start, end))
                start = end = ts
        sessions.append((u, start, end))
    days = {r.ts.date() for r in events}
    agg = defaultdict(lambda: [0, set(), 0, 0])
    for day in days:
        w0 = datetime.datetime.combine(day, datetime.time())
        w1 = w0 + datetime.timedelta(hours=1)
        for u, s0, s1 in sessions:
            if s0 <= w1 and s1 >= w0:
                ov = int(
                    (min(s1, w1) - max(s0, w0)).total_seconds() * 1_000_000
                )
                a = agg[day.isoformat()]
                a[0] += 1
                a[1].add(u)
                a[2] += ov
                a[3] = max(a[3], ov)
    got = BQ["join_interval_overlap_binned"](spark, sf_dir).collect()
    assert len(got) == len(agg)
    for r in got:
        n, users, tot, mx = agg[r.day]
        assert (r.n_sessions, r.n_users, r.total_overlap_us, r.max_overlap_us) == (
            n,
            len(users),
            tot,
            mx,
        ), r.day


def test_degree_histogram_partitions_nodes(spark, sf_dir):
    """Buckets partition the node set: observed min/max degrees sit inside
    each dyadic band, node counts sum to the distinct-node total, and
    floor-division shares sum to at most 1e6."""
    from dataflow_pubsub_message_encryption_spark.operators.graph import QUERIES as GQ

    rows = sorted(
        GQ["graph_degree_histogram"](spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    total = sum(r.n_nodes for r in rows)
    assert sum(r.share_ppm for r in rows) <= 1_000_000
    for r in rows:
        lo = 1 if r.bucket == 0 else (1 << (r.bucket - 1)) + 1
        hi = None if r.bucket == 12 else (1 << r.bucket) if r.bucket else 1
        assert r.min_deg >= lo
        if hi is not None:
            assert r.max_deg <= hi
        assert r.min_deg <= r.max_deg
        assert 0 < r.n_nodes <= total


def test_aging_buckets_cover_open_orders(spark, sf_dir):
    """Counts sum to the open+partial order population, every bucket is a
    valid capped band, and values are positive."""
    from dataflow_pubsub_message_encryption_spark.operators.behavior import (
        QUERIES as BQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    o = load(spark, sf_dir, "orders")
    n_open = o.filter(F.col("o_orderstatus").isin("O", "P")).count()
    rows = BQ["orders_open_aging_buckets"](spark, sf_dir).collect()
    assert sum(r.n_orders for r in rows) == n_open
    for r in rows:
        assert r.status in ("O", "P")
        assert 0 <= r.bucket <= 4
        assert r.age_days_lo == r.bucket * 180
        assert r.value_unit > 0


def test_pq_code_balance_covers_codebook(spark, sf_dir):
    """Every (subspace, codeword) slot is reported (dead codewords
    included as zero rows), per-subspace counts sum to the corpus size,
    and shares are valid floor-division ppm."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    n = load(spark, sf_dir, "embeddings").count()
    rows = SQ["emb_pq_code_balance"](spark, sf_dir).collect()
    assert len(rows) == 4 * 8  # _PQ_M x _PQ_K
    per_m = {}
    for r in rows:
        assert 0 <= r.m <= 3 and 0 <= r.k <= 7
        assert r.n_vecs >= 0
        assert r.share_ppm == r.n_vecs * 1_000_000 // n
        per_m[r.m] = per_m.get(r.m, 0) + r.n_vecs
    assert all(v == n for v in per_m.values())


def test_oov_rates_are_consistent(spark, sf_dir):
    """Per-source token totals sum to the corpus token count, OOV never
    exceeds the total, and the ppm rate is the exact floor division."""
    from dataflow_pubsub_message_encryption_spark.operators.text import QUERIES as TQ
    from dataflow_pubsub_message_encryption_spark.functions.textfns import tokens
    from dataflow_pubsub_message_encryption_spark.sources import load

    docs = load(spark, sf_dir, "documents")
    corpus_tokens = docs.select(
        F.explode(tokens("text")).alias("t")
    ).count()
    rows = TQ["text_vocab_coverage_oov"](spark, sf_dir).collect()
    assert sum(r.n_tokens for r in rows) == corpus_tokens
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_ppm == r.n_oov * 1_000_000 // r.n_tokens


def test_rolling_median_matches_python_referee(spark, sf_dir):
    """Full referee: recompute the 7-day lower median from the daily
    cells in plain Python and require every row to match exactly."""
    from dataflow_pubsub_message_encryption_spark.operators.behavior import (
        QUERIES as BQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load_events
    import datetime

    ev = load_events(spark, sf_dir)
    cells = {
        (r.event_type, r.day): r.cnt
        for r in ev.groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    got = BQ["window_rolling_median"](spark, sf_dir).collect()
    assert len(got) == len(cells)
    for r in got:
        day = datetime.date.fromisoformat(r.day)
        window = sorted(
            cells[(r.event_type, day + datetime.timedelta(days=k))]
            for k in range(-3, 4)
            if (r.event_type, day + datetime.timedelta(days=k)) in cells
        )
        assert r.n_window == len(window) <= 7
        assert r.rolling_med == window[(len(window) + 1) // 2 - 1], (
            r.event_type,
            r.day,
        )


def test_grouped_holdout_never_splits_a_source(spark, sf_dir):
    """The grouping law: recompute each source's split in Python from the
    same hash rule and confirm the census is consistent with every source
    living in exactly one split; splits partition the corpus."""
    import hashlib

    from dataflow_pubsub_message_encryption_spark.operators.sampling import (
        QUERIES as PQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    docs = load(spark, sf_dir, "documents")
    per_source = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }

    def split_of(src: str) -> str:
        b = int(hashlib.sha256(src.encode()).hexdigest()[:2], 16) % 10
        return "train" if b < 8 else ("valid" if b == 8 else "test")

    want = {}
    for src, n in per_source.items():
        s = split_of(src)
        d = want.setdefault(s, [0, 0])
        d[0] += 1
        d[1] += n
    rows = PQ["split_grouped_holdout"](spark, sf_dir).collect()
    assert {r.split for r in rows} == set(want)
    for r in rows:
        assert (r.n_sources, r.n_docs) == tuple(want[r.split]), r.split
    assert sum(r.n_docs for r in rows) == sum(per_source.values())


def test_dedup_savings_stages_are_monotone(spark, sf_dir):
    """Each stage can only shrink the corpus; the raw stage matches the
    table census exactly; every near-dup component contributes at least
    one survivor (no cluster is wiped out entirely)."""
    from dataflow_pubsub_message_encryption_spark.operators.graph import (
        QUERIES as GQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    docs = load(spark, sf_dir, "documents")
    truth = docs.agg(F.count("*"), F.sum("n_chars")).collect()[0]
    rows = {r.stage_idx: r for r in GQ["corpus_dedup_savings_report"](spark, sf_dir).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert (rows[0].n_docs, rows[0].n_bytes) == (truth[0], truth[1])
    assert rows[0].savings_ppm == 0
    for a, b in ((0, 1), (1, 2)):
        assert rows[b].n_docs <= rows[a].n_docs
        assert rows[b].n_bytes <= rows[a].n_bytes
        assert rows[b].savings_ppm >= rows[a].savings_ppm
    # no component wiped out: survivors >= number of distinct clusters
    # intersected with stage-1 survivors is implied by keep-one-per-cluster;
    # check the weaker global bound that SOMETHING survives stage 2
    assert rows[2].n_docs > 0


def test_hapax_counts_are_consistent(spark, sf_dir):
    """Per-source hapax law: n_hapax <= vocab <= n_tokens, the ratio is
    exactly n_hapax/vocab, and the token totals reconcile with an
    independent per-doc split-length census."""
    from dataflow_pubsub_message_encryption_spark.operators.text import QUERIES as TQ
    from dataflow_pubsub_message_encryption_spark.sources import load

    rows = TQ["text_hapax_ratio"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.vocab <= r.n_tokens
        assert abs(r.hapax_ratio - round(r.n_hapax / r.vocab, 6)) < 1e-9
    totals = {
        x.source: x.t
        for x in load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }
    assert {r.source: r.n_tokens for r in rows} == totals


def test_reciprocal_nn_pairs_are_disjoint_mutual(spark, sf_dir):
    """Mutual-NN structural law: each vector's in-bucket top-1 is unique,
    so a vector can appear in AT MOST one reciprocal pair — the emitted
    pairs are vertex-disjoint, canonically ordered (vec_a < vec_b), and a
    strict subset of the bucket-blocked candidate pairs scored by
    dedup_embedding_lsh's machinery."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
    )

    pairs = SQ["sim_reciprocal_nn"](spark, sf_dir).collect()
    assert pairs
    seen = set()
    for p in pairs:
        assert p.vec_a < p.vec_b
        assert p.vec_a not in seen and p.vec_b not in seen
        seen.add(p.vec_a)
        seen.add(p.vec_b)
        assert -1.0 <= p.cos_sim <= 1.0


def test_attrition_rules_partition_the_corpus(spark, sf_dir):
    """First-kill attribution law: the rule census partitions documents —
    doc and token totals equal the raw corpus totals, shares are exact
    ppm floor-divisions, and the '1_too_short' bucket equals an
    independent count of sub-floor docs."""
    from dataflow_pubsub_message_encryption_spark.operators.curation import (
        _ATTR_MIN_TOKENS,
        QUERIES as CQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    rows = {r.rule: r for r in CQ["corpus_filter_attrition_report"](spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_tokens = docs.agg(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert sum(r.n_docs for r in rows.values()) == n_docs
    assert sum(r.n_tokens for r in rows.values()) == n_tokens
    for r in rows.values():
        assert r.share_ppm == r.n_docs * 1_000_000 // n_docs
    short = docs.filter(F.size(F.split("text", " ")) < _ATTR_MIN_TOKENS).count()
    assert rows["1_too_short"].n_docs == short
    assert rows["4_survived"].n_docs > 0


def test_loo_accuracy_reads_chance_on_unstructured_labels(spark, sf_dir):
    """1-NN label accuracy laws: denominators reconcile (n_correct <=
    n_eval, total evaluated <= corpus size), ppm is the exact floor-div —
    and the eval does its JOB on this fixture: the synthetic labels are
    random w.r.t. embedding geometry, so pooled accuracy must read
    chance-level (within 3x of the 1/|labels| baseline in either
    direction), NOT high — this is the op correctly flagging an
    embedding whose NN structure ignores labels."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    rows = SQ["emb_knn_loo_accuracy"](spark, sf_dir).collect()
    assert rows
    emb = load(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    counts = {r[0]: r[1] for r in emb.groupBy("label").count().collect()}
    tot_eval = sum(r.n_eval for r in rows)
    tot_hit = sum(r.n_correct for r in rows)
    assert 0 < tot_eval <= n_vecs
    for r in rows:
        assert 0 <= r.n_correct <= r.n_eval
        assert r.acc_ppm == r.n_correct * 1_000_000 // r.n_eval
    chance = 1.0 / len(counts)
    pooled = tot_hit / tot_eval
    assert chance / 3 < pooled < chance * 3, (
        f"pooled LOO accuracy {pooled:.3f} not chance-level "
        f"(~{chance:.3f}) on the label-unstructured fixture"
    )


def test_chunk_savings_reconcile_with_doc_dupes(spark, sf_dir):
    """Chunk-store accounting laws: bytes_total equals the exact corpus
    UTF-8 byte count, n_unique <= n_chunks, bytes_unique <= bytes_total,
    ppm is the exact floor-div — and savings are AT LEAST the bytes of
    whole-document exact duplicates (every duplicated doc duplicates all
    its chunks; shared chunks across distinct docs only add)."""
    from dataflow_pubsub_message_encryption_spark.operators.multimodal import (
        QUERIES as MQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    r = MQ["multimodal_chunk_dedup_savings"](spark, sf_dir).collect()[0]
    docs = load(spark, sf_dir, "documents")
    total = docs.agg(F.sum(F.octet_length("text"))).collect()[0][0]
    assert r.bytes_total == total
    assert 0 < r.n_unique <= r.n_chunks
    assert 0 < r.bytes_unique <= r.bytes_total
    saved = r.bytes_total - r.bytes_unique
    assert r.savings_ppm == saved * 1_000_000 // r.bytes_total
    dup_bytes = (
        docs.groupBy(F.sha2("text", 256).alias("h"))
        .agg(
            F.count("*").alias("cnt"),
            F.first(F.octet_length("text")).alias("nb"),
        )
        .filter(F.col("cnt") > 1)
        .agg(F.sum((F.col("cnt") - 1) * F.col("nb")))
        .collect()[0][0]
        or 0
    )
    assert saved >= dup_bytes


def test_cdc_chunks_survive_prefix_shift_fixed_stride_does_not(spark, sf_dir):
    """THE reason content-defined chunking exists: prepend one byte to
    every payload and most CDC chunk hashes survive (boundaries re-align
    at the next gear hit), while every fixed-stride chunk shifts and
    dies. Pinned: CDC survival > 50%, stride survival < 10% — plus byte
    conservation for both chunkers on the same corpus."""
    from collections import Counter

    from dataflow_pubsub_message_encryption_spark.operators.multimodal import (
        _cdc_chunks,
        QUERIES as MQ,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(100)

    def cdc_chunks(prefix=None):
        # chunking goes through the SHARED registered-op kernel (ADVICE
        # r8 item 3: this test used to re-implement the pipeline and
        # would have validated stale logic); only the prefix-shift
        # harness lives here
        t = F.concat(F.lit(prefix), "text") if prefix else F.col("text")
        hx = docs.select(
            "doc_id", F.lower(F.hex(F.encode(t, "UTF-8"))).alias("h")
        )
        return _cdc_chunks(hx).select("doc_id", "chash").collect()

    def stride_chunks(prefix=None):
        t = F.concat(F.lit(prefix), "text") if prefix else F.col("text")
        hx = docs.select(
            "doc_id", F.lower(F.hex(F.encode(t, "UTF-8"))).alias("h")
        )
        return hx.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("h"), F.lit(128))
            ).alias("p"),
            "h",
        ).select(
            "doc_id",
            F.sha2(F.expr("substring(h, p, 128)"), 256).alias("chash"),
        ).collect()

    def survival(base, shifted):
        b = Counter((r.doc_id, r.chash) for r in base)
        s = Counter((r.doc_id, r.chash) for r in shifted)
        return sum(min(c, s[k]) for k, c in b.items()) / sum(b.values())

    cdc = survival(cdc_chunks(), cdc_chunks("Z"))
    stride = survival(stride_chunks(), stride_chunks("Z"))
    assert cdc > 0.5, f"CDC chunk survival {cdc:.2f} — gear lost its point"
    assert stride < 0.1, f"stride survival {stride:.2f} — test is vacuous"
    # byte conservation: both registered chunkers account every byte once
    c = MQ["multimodal_cdc_chunk_savings"](spark, sf_dir).collect()[0]
    f = MQ["multimodal_chunk_dedup_savings"](spark, sf_dir).collect()[0]
    assert c.bytes_total == f.bytes_total


def test_cdc_spans_tile_each_payload_exactly(spark, sf_dir):
    """Reconstruction invariant: per document, the CDC chunk spans are
    contiguous (each start = previous end + 1), begin at byte 1, end at
    the payload's last byte, and are byte-aligned (even hex lengths) —
    so concatenating the chunks reproduces the payload exactly."""
    from pyspark.sql import Window

    from dataflow_pubsub_message_encryption_spark.operators.multimodal import (
        _CDC_HASH_SQL,
        _CDC_MASK,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    hx = (
        load(spark, sf_dir, "documents")
        .limit(200)
        .select(
            "doc_id",
            F.lower(F.hex(F.encode("text", "UTF-8"))).alias("h"),
            F.length(F.lower(F.hex(F.encode("text", "UTF-8")))).alias("hl"),
        )
    )
    pos = hx.select(
        "doc_id",
        "h",
        "hl",
        F.explode(
            F.when(
                F.length("h") >= 16,
                F.sequence(F.lit(16), F.length("h"), F.lit(2)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    )
    bnd = pos.filter(
        F.expr(f"{_CDC_HASH_SQL} % {_CDC_MASK} = 0 AND i < length(h)")
    ).select("doc_id", "hl", F.col("i").cast("long").alias("i"))
    end = hx.select("doc_id", "hl", F.length("h").cast("long").alias("i"))
    w = Window.partitionBy("doc_id").orderBy("i")
    spans = (
        bnd.unionByName(end)
        .withColumn("s", F.coalesce(F.lag("i").over(w), F.lit(0)) + 1)
        .collect()
    )
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.i)
        assert rs[0].s == 1, f"doc {doc}: first chunk starts at {rs[0].s}"
        assert rs[-1].i == rs[-1].hl, f"doc {doc}: last chunk misses the tail"
        for a, b in zip(rs, rs[1:]):
            assert b.s == a.i + 1, f"doc {doc}: gap/overlap at {a.i}->{b.s}"
        for r in rs:
            assert (r.i - r.s + 1) % 2 == 0, f"doc {doc}: odd hex span"


def test_winnowing_guarantee_vs_exact_spans(spark, sf_dir):
    """Winnowing's defining theorem (Schleimer et al.): any substring of
    length >= k + w - 1 shared between two documents produces at least
    one SHARED fingerprint in both. Cross-checked against the EXACT
    suffix-array spans: every doc whose max cross-doc span >= 23
    (k=8, w=16) must report n_shared >= 1 — plus the structural laws
    0 <= n_shared <= n_fingerprints and exact ppm."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        _WIN_K,
        _WIN_W,
        QUERIES as DQ,
    )

    fp = {
        r.doc_id: r
        for r in DQ["dedup_winnowing_fingerprints"](spark, sf_dir).collect()
    }
    spans = {
        r.doc_id: r.max_shared_span
        for r in DQ["dedup_span_suffix_array"](spark, sf_dir).collect()
    }
    assert fp
    guarantee = _WIN_K + _WIN_W - 1
    hits = 0
    for d, r in fp.items():
        assert 0 <= r.n_shared <= r.n_fingerprints
        assert r.shared_ppm == r.n_shared * 1_000_000 // r.n_fingerprints
        if spans.get(d, 0) >= guarantee:
            hits += 1
            assert r.n_shared >= 1, (
                f"doc {d}: {spans[d]}-char shared span but zero shared "
                f"fingerprints — the winnowing guarantee is broken"
            )
    assert hits > 0, "no doc reaches the guarantee length — law is vacuous"
