"""Property-based tests (hypothesis) for the curation transform laws,
run over GENERATED corpora — not the fixtures — so edge shapes the driver
data never produces (1-token docs, exact-multiple lengths, duplicate
texts across sources) are exercised. One Spark job per example; examples
kept small and few so the suite stays fast."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.operators.curation import (
    _CHUNK_STRIDE,
    _CHUNK_W,
    chunk_windows,
)
from dataflow_pubsub_message_encryption_spark.operators.sampling import (
    _PACK_CAPACITY,
    _split_col,
    pack_bins,
)

# docs: ids are list positions; token counts 1..90 hit the 1-chunk,
# exact-boundary, and multi-chunk regimes around W=32 / stride=24
_corpus = st.lists(
    st.integers(min_value=1, max_value=90), min_size=1, max_size=12
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs_df(spark, token_counts):
    rows = [
        (i, f"s{i % 3}", " ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate(token_counts)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@given(token_counts=_corpus)
@settings(**_SETTINGS)
def test_chunking_laws_hold_for_any_corpus(spark, token_counts):
    out = chunk_windows(_docs_df(spark, token_counts)).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(range(len(token_counts)))
    for doc_id, n in enumerate(token_counts):
        cs = sorted(per_doc[doc_id], key=lambda r: r.chunk_idx)
        # chunk count: ceil(n / stride); indices dense from 0
        assert len(cs) == (n + _CHUNK_STRIDE - 1) // _CHUNK_STRIDE
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        # width law + total-coverage law (stride-prefixes tile the doc)
        for c in cs:
            assert c.chunk_tokens == min(
                _CHUNK_W, n - c.chunk_idx * _CHUNK_STRIDE
            )
        covered = sum(min(_CHUNK_STRIDE, n - c.chunk_idx * _CHUNK_STRIDE) for c in cs)
        assert covered == n


@given(token_counts=_corpus)
@settings(**_SETTINGS)
def test_packing_laws_hold_for_any_corpus(spark, token_counts):
    docs = _docs_df(spark, token_counts)
    bins = pack_bins(docs).collect()
    assert sum(r.tokens_packed for r in bins) == sum(token_counts)
    per_src_bins: dict[str, set] = {}
    for r in bins:
        per_src_bins.setdefault(r.source, set()).add(r.bin)
        assert r.n_docs >= 1
        # overflow bounded by the single doc straddling the boundary
        assert r.tokens_packed < _PACK_CAPACITY + max(token_counts)
    for src, got in per_src_bins.items():
        assert got == set(range(len(got))), src


@given(token_counts=_corpus, dup_idx=st.integers(min_value=0, max_value=11))
@settings(**_SETTINGS)
def test_split_is_content_deterministic(spark, token_counts, dup_idx):
    # duplicate one text under a DIFFERENT doc_id/source: identical text
    # must land in the identical split (contamination-freedom), and the
    # assignment must be stable across evaluations
    dup_idx %= len(token_counts)
    docs = _docs_df(spark, token_counts)
    dup = docs.filter(F.col("doc_id") == dup_idx).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.lit("sX").alias("source"),
        "text",
    )
    both = docs.unionByName(dup).select("doc_id", "text", _split_col().alias("split"))
    leaky = (
        both.groupBy("text")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert leaky == 0
    a = {r.doc_id: r.split for r in both.collect()}
    b = {r.doc_id: r.split for r in both.collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}


# containment corpora: small shared vocab so overlapping/contained docs
# actually occur; doc = sorted token-id set, source from a 2-value split
_contain_corpus = st.lists(
    st.sets(st.integers(min_value=0, max_value=11), min_size=1, max_size=8),
    min_size=2,
    max_size=10,
)


@given(tok_sets=_contain_corpus)
@settings(**_SETTINGS)
def test_prefix_filter_blocked_containment_is_lossless(spark, tok_sets):
    """The SSJoin prefix filter is a pure candidate prune: on ANY corpus
    the blocked containment join must return exactly the rows of the
    naive quadratic — including subset pairs (cont = 1.0), equal-size
    pairs (the tie orientation), and 1-token docs (prefix = whole set)."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_blocked,
    )

    rows = [
        (i, f"s{i % 2}", " ".join(f"w{t}" for t in sorted(s)))
        for i, s in enumerate(tok_sets)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    key = lambda r: (r.doc_a, r.doc_b)  # noqa: E731
    naive = {key(r): (r.inter, r.cont) for r in containment_pairs(docs).collect()}
    blocked = {
        key(r): (r.inter, r.cont)
        for r in containment_pairs_blocked(docs).collect()
    }
    assert blocked == naive


# -- BPE merge-loop law: declarative == scalar reference on random corpora --

_bpe_words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=8
)
_bpe_corpus = st.lists(_bpe_words, min_size=1, max_size=4)


@given(corpus=_bpe_corpus)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_merges_match_scalar_reference(spark, corpus):
    """The windows-based non-overlapping merge must agree with the
    scalar left-to-right reference on adversarial corpora — a 2-letter
    alphabet maximizes same-symbol runs ('aaaa' + pair (a,a)) and
    merged-symbol re-pairing, the two places a declarative rewrite can
    silently diverge from real BPE."""
    import shutil
    import tempfile

    import pandas as pd

    from dataflow_pubsub_message_encryption_spark.operators.text import (
        QUERIES as TQ,
        _BPE_MERGES,
    )
    from tests.test_ext_ops import _py_bpe_merges

    texts = [" ".join(words) for words in corpus]
    d = tempfile.mkdtemp(prefix="bpe-prop-")
    try:
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
            f"{d}/documents.parquet"
        )
        got = [
            (r.left_sym, r.right_sym, r.pair_cnt)
            for r in TQ["text_bpe_merges"](spark, d).orderBy("merge_rank").collect()
        ]
        counts: dict[str, int] = {}
        for t in texts:
            for w in t.split(" "):
                counts[w] = counts.get(w, 0) + 1
        assert got == _py_bpe_merges(counts, _BPE_MERGES), f"corpus={texts}"
    finally:
        shutil.rmtree(d, ignore_errors=True)


# values with heavy ties + unique ids: the regime where rank machinery bugs
# hide (tie-break correctness, range-boundary placement, ntile remainders)
_rank_values = st.lists(
    st.integers(min_value=0, max_value=5), min_size=1, max_size=40
)


@given(values=_rank_values, k=st.integers(min_value=1, max_value=7))
@settings(**_SETTINGS)
def test_global_rank_and_ntile_match_window_forms(spark, values, k):
    """_global_rank must equal the single-partition row_number for ANY
    input (including n < partitions and heavy ties), and _ntile_from_rank
    must equal F.ntile(k) — the laws the 5 scalable-window queries stand
    on, checked beyond the fixtures."""
    from pyspark.sql import Window

    from dataflow_pubsub_message_encryption_spark.operators.scale import (
        _global_rank,
        _ntile_from_rank,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    )
    ranked, n = _global_rank(df, "v", "id")
    assert n == len(values)
    got = {r.id: r.rk for r in ranked.collect()}

    w = Window.orderBy("v", "id")
    want_df = df.select(
        "id",
        F.row_number().over(w).alias("rk"),
        F.ntile(k).over(w).alias("nt"),
    ).collect()
    want = {r.id: r.rk for r in want_df}
    assert got == want, "distributed rank diverged from window row_number"

    nt_got = {
        r.id: r.nt
        for r in ranked.withColumn(
            "nt", _ntile_from_rank(F.col("rk"), n, k)
        ).collect()
    }
    nt_want = {r.id: r.nt for r in want_df}
    assert nt_got == nt_want, "integer ntile formula diverged from F.ntile"


@given(n=st.integers(min_value=1, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_sd_auto_k_properties(n):
    """SemDeDup cell rule: clamped to [4, 4096], monotone non-decreasing,
    and inside the clamp band the occupancy budget holds exactly:
    (k-1)*B < n <= k*B — cells average <= B vectors by construction
    (the measured wall-time minimizer; see _sd_auto_k's docstring for
    the rejected balanced alternative)."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        _SD_CELL_B,
        _sd_auto_k,
    )

    k = _sd_auto_k(n)
    assert 4 <= k <= 4096
    assert k <= _sd_auto_k(n + 1)
    if 4 < k < 4096:
        assert (k - 1) * _SD_CELL_B < n <= k * _SD_CELL_B


@given(n=st.integers(min_value=1, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_dc_auto_every_properties(n):
    """Decontam modulus rule: >= the floor, monotone, and the eval set
    it induces (ids = 0 mod every in [0, n)) never exceeds
    max(_DC_EVAL_TARGET, n // _DC_EVERY_MIN) — bounded at ~10 rows once
    n clears the floor regime."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        _DC_EVAL_TARGET,
        _DC_EVERY_MIN,
        _dc_auto_every,
    )

    ev = _dc_auto_every(n)
    assert ev >= _DC_EVERY_MIN
    assert ev <= _dc_auto_every(n + 1)
    eval_rows = (n + ev - 1) // ev  # |{0, ev, 2ev, ...} ∩ [0, n)|
    assert eval_rows <= max(_DC_EVAL_TARGET, -(-n // _DC_EVERY_MIN))
    if n >= _DC_EVERY_MIN * _DC_EVAL_TARGET:
        assert eval_rows <= _DC_EVAL_TARGET + 1
