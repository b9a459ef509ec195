"""Law tests for the round-9 operators — the kernel ≡ explode
equivalence laws behind the 100 TB byte-grain rewrites (VERDICT r8
item 2), the suffix-array prefix-doubling cap law (item 6), and the
edge-case guards ADVICE r8 flagged (short/empty payloads the fixtures
never exercise)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- CDC chunker: Arrow kernel ≡ SQL-mirror explode/lag twin ---------------


def test_cdc_kernel_equals_exploded_on_fixtures(spark, sf_dir):
    """The registered CDC op serves the `_cdc_chunks` Arrow kernel; the
    old explode/lag form survives as `_cdc_chunks_exploded` purely so
    this law can pin them result-identical on real fixture text."""
    from dataflow_pubsub_message_encryption_spark.operators.multimodal import (
        _cdc_chunks,
        _cdc_chunks_exploded,
        with_media,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    hx = with_media(load(spark, sf_dir, "documents")).select(
        "doc_id", F.lower(F.hex("payload")).alias("h")
    )
    assert _rows(_cdc_chunks(hx)) == _rows(_cdc_chunks_exploded(hx))


def test_cdc_kernel_edge_payloads(spark):
    """Boundary docs the fixtures lack: empty payload (the oracle's
    unconditional end-row -> sha256('') with nb 0 — the crash class
    ADVICE r8 flagged in the fixed-stride sibling), sub-window payloads
    (< 16 hex chars -> single whole-doc chunk), and an exact-window
    payload. Kernel ≡ explode twin on all of them."""
    from dataflow_pubsub_message_encryption_spark.operators.multimodal import (
        _cdc_chunks,
        _cdc_chunks_exploded,
    )

    docs = spark.createDataFrame(
        [
            (0, None),  # NULL payload: the defined no-rows contract
            (1, ""),
            (2, "a"),
            (3, "abcdefg"),
            (4, "abcdefgh"),
            (5, "xy" * 40),
        ],
        "doc_id long, text string",
    )
    hx = docs.select(
        "doc_id", F.lower(F.hex(F.encode("text", "UTF-8"))).alias("h")
    )
    k = _rows(_cdc_chunks(hx))
    e = _rows(_cdc_chunks_exploded(hx))
    assert k == e
    assert not [t for t in k if t[0] == 0]  # NULL payload -> no rows
    # the empty payload emitted exactly one 0-byte chunk, not a crash
    empty = [t for t in k if t[0] == 1]
    assert len(empty) == 1 and empty[0][2] == 0


def test_fixed_stride_chunker_survives_empty_payload(spark):
    """ADVICE r8: unguarded sequence(1, 0, 128) raised 'Illegal sequence
    boundaries' on an empty payload where the oracle returns no rows.
    The guard makes the Spark side emit no chunk rows for it while still
    chunking non-empty docs."""
    from dataflow_pubsub_message_encryption_spark.operators.multimodal import (
        _CHUNK_HEX,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "hello world")], "doc_id long, text string"
    )
    hx = docs.select(
        "doc_id", F.lower(F.hex(F.encode("text", "UTF-8"))).alias("h")
    )
    ch = hx.select(
        "doc_id",
        F.explode(
            F.when(
                F.length("h") >= 1,
                F.sequence(F.lit(1), F.length("h"), F.lit(_CHUNK_HEX)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("p"),
    )
    got = {r.doc_id for r in ch.collect()}
    assert got == {2}


# --- winnowing: Arrow kernel ≡ SQL-mirror explode/window twin --------------


def test_winnow_kernel_equals_exploded_on_fixtures(spark, sf_dir):
    """The registered winnowing op serves the `_winnow_fps` Arrow
    kernel; the explode/window form survives as `_winnow_fps_exploded`
    purely so this law can pin them result-identical on fixture text
    (incl. non-ASCII zh docs — ord == both engines' ascii())."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        _winnow_fps,
        _winnow_fps_exploded,
    )
    from dataflow_pubsub_message_encryption_spark.sources import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    assert _rows(_winnow_fps(docs)) == _rows(_winnow_fps_exploded(docs))


def test_winnow_kernel_edge_docs(spark):
    """Boundary docs the fixtures lack (min fixture text is 44+ chars):
    below k (no k-grams — the DESCENDING-sequence garbage class ADVICE
    r8 flagged), exactly k (one k-gram), between k and k+w-1 (every
    window is a suffix window), exactly k+w-1, and beyond. Kernel ≡
    guarded explode twin on all of them; sub-k docs emit nothing."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        _WIN_K,
        _WIN_W,
        _winnow_fps,
        _winnow_fps_exploded,
    )

    texts = [
        (0, None),  # NULL text: the defined no-rows contract
        (1, ""),
        (2, "short"),  # < k
        (3, "x" * (_WIN_K - 1)),
        (4, "abcdefgh"),  # == k: one k-gram
        (5, "abcdefghij"),  # k < n < k+w-1
        (6, "qwertyuiopasdfghjklzxcv"[: _WIN_K + _WIN_W - 1]),
        (7, "the quick brown fox jumps over the lazy dog again and again"),
        (8, "中文文本去重测试中文文本去重测试"),  # non-ASCII codepoints
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    k = _rows(_winnow_fps(docs))
    e = _rows(_winnow_fps_exploded(docs))
    assert k == e
    assert not [t for t in k if t[0] in (0, 1, 2, 3)]  # NULL/sub-k: nothing
    assert len([t for t in k if t[0] == 4]) == 1  # one k-gram -> one fp


def test_winnow_poly_weights_match_inlined_sql():
    """The kernel's numpy weights and the SQL literal weights are the
    same 257^j mod (2^31-1) ladder — drift here would silently decouple
    the kernel from the oracle."""
    import re

    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        _WIN_HASH_SQL,
        _WIN_M,
        _WIN_POLY,
    )
    from dataflow_pubsub_message_encryption_spark.operators.multimodal import (
        _CDC_HASH_SQL,
        _CDC_M,
        _CDC_W,
    )

    win_sql = [int(w) for w in re.findall(r"\* (\d+) %", _WIN_HASH_SQL)]
    assert win_sql == _WIN_POLY
    assert _WIN_POLY == [pow(257, 7 - j, _WIN_M) for j in range(8)]
    cdc_sql = [int(w) for w in re.findall(r"\* (\d+) %", _CDC_HASH_SQL)]
    assert cdc_sql == _CDC_W
    assert _CDC_W == [pow(257, j, _CDC_M) for j in range(16)]


# --- blocked graph-ANN: the bits-∝-log-n scale knob -------------------------


def test_graph_ann_scaled_bits_wiring(spark, sf_dir):
    """The scale-slope run measured the fixed-width blocked build
    SUPERLINEAR (15× at 10× vectors — bucket-mate pairs ∝ n²/2^bits);
    the fix is the bits-∝-log-n table width. Pin the wiring: at the
    registered width (4 bits) the scaled variant reproduces the
    registered op row-for-row, and a wider build (6 bits) still returns
    a full top-k (the knob narrows candidates, never breaks the walk)."""
    from dataflow_pubsub_message_encryption_spark.operators.similarity import (
        QUERIES as SQ,
        sim_ann_graph_topk_blocked_scaled,
    )

    reg = [tuple(r) for r in SQ["sim_ann_graph_topk"](spark, sf_dir).collect()]
    same = [
        tuple(r)
        for r in sim_ann_graph_topk_blocked_scaled(spark, sf_dir, 4).collect()
    ]
    assert reg == same
    wide = sim_ann_graph_topk_blocked_scaled(spark, sf_dir, 6).collect()
    assert len(wide) == len(reg)


# --- suffix-array prefix doubling ------------------------------------------


def test_suffix_doubling_extends_the_cap_exactly(spark, sf_dir):
    """The cap law: for every doc, the capped-64 suffix array reports
    exactly least(cap, true_span) and the doubling op reports exactly
    least(256, true_span), so capped == least(doubled, 64) — saturated
    docs grow, un-saturated docs agree bit-for-bit. Plus: somebody must
    actually exceed 64 on the fixtures (the corpus shares >256-char
    spans), or the extension is vacuous."""
    from dataflow_pubsub_message_encryption_spark.operators.dedup import (
        QUERIES as DQ,
    )

    capped = {
        r.doc_id: r.max_shared_span
        for r in DQ["dedup_span_suffix_array"](spark, sf_dir).collect()
    }
    doubled = {
        r.doc_id: r.max_shared_span
        for r in DQ["dedup_span_suffix_doubling"](spark, sf_dir).collect()
    }
    assert set(capped) == set(doubled)
    for d, c in capped.items():
        assert c == min(doubled[d], 64), (
            f"doc {d}: capped {c} != least(doubled {doubled[d]}, 64)"
        )
    assert any(v > 64 for v in doubled.values()), "extension is vacuous"
