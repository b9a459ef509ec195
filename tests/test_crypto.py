"""Encryption-law and cache-behavior tests (SURVEY §5.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.functions import crypto
from dataflow_pubsub_message_encryption_spark.sources import (
    load_events,
    with_envelope,
)


def test_kms_wrap_roundtrip_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(st.binary(min_size=1, max_size=64))
    def roundtrip(plain):
        assert crypto.kms_unwrap(crypto.kms_wrap(plain)) == plain
        # wrapped differs from plain (keystream is not identity)
        assert crypto.kms_wrap(plain) != plain

    roundtrip()


def test_wrap_dek_deterministic_wire_value():
    w1 = crypto.wrap_dek(crypto.dek(0))
    w2 = crypto.wrap_dek(crypto.dek(0))
    assert w1 == w2  # stable attribute value => cacheable key
    assert crypto.unwrap_dek(w1) == crypto.dek(0)


def test_aes_roundtrip_identity(spark):
    """aes_decrypt(aes_encrypt(x, k), k) = x for random payloads."""
    df = spark.range(200).select(
        F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)).alias(
            "x"
        )
    )
    key = crypto.dek(1)
    out = df.withColumn(
        "rt",
        F.aes_decrypt(
            F.aes_encrypt(F.col("x").cast("binary"), F.lit(key)), F.lit(key)
        ).cast("string"),
    )
    assert out.filter(F.col("rt") != F.col("x")).count() == 0


def test_tamper_detection_drops_rows(spark, sf_dir):
    events = load_events(spark, sf_dir)
    n = events.count()
    env = with_envelope(events, tamper=True)
    survivors = crypto.decrypt_verify(env)
    ids = [r.event_id for r in survivors.select("event_id").collect()]
    assert len(ids) == n // 2
    assert all(i % 2 == 0 for i in ids)


def test_wrong_key_decrypt_fails(spark):
    key, wrong = crypto.dek(0), crypto.dek(1)
    out = (
        spark.range(5)
        .select(F.lit("secret").cast("binary").alias("x"))
        .select(
            F.try_aes_decrypt(
                F.aes_encrypt(F.col("x"), F.lit(key)), F.lit(wrong)
            ).alias("bad")
        )
    )
    assert all(r.bad is None for r in out.collect())


def test_dek_cache_amortizes_unwraps():
    """<=1 mock-KMS unwrap per distinct key per process (the reference's
    per-worker cache semantics), regardless of message count."""
    crypto.reset_cache()
    keys = [crypto.wrap_dek(crypto.dek(i)) for i in range(4)]
    for _ in range(1000):
        for w in keys:
            crypto._cached_unwrap(w)
    assert crypto.unwrap_calls() == 4


def test_dek_cache_ttl_expiry():
    crypto.reset_cache()
    w = crypto.wrap_dek(crypto.dek(0))
    crypto._cached_unwrap(w, ttl=0.05)
    crypto._cached_unwrap(w, ttl=0.05)
    assert crypto.unwrap_calls() == 1
    import time

    time.sleep(0.06)
    crypto._cached_unwrap(w, ttl=0.05)
    assert crypto.unwrap_calls() == 2


def test_mac_matches_duckdb(spark, duck):
    """Spark sha2(key||payload) == DuckDB sha256(key||payload), lowercase hex."""
    payload = "hello-world"
    s = (
        spark.range(1)
        .select(crypto.mac_col(F.lit(payload)).alias("m"))
        .collect()[0]
        .m
    )
    d = duck.execute(
        "SELECT sha256(concat(?, ?))", [crypto.MAC_KEY, payload]
    ).fetchone()[0]
    assert s == d


def test_broadcast_strategy_equals_cached_udf(spark, sf_dir):
    """Both unwrap strategies must produce the identical surviving row set
    and plaintext (same semantics, different physical shape)."""
    events = load_events(spark, sf_dir)
    env = with_envelope(events, tamper=True)
    a = crypto.decrypt_verify(env).select("event_id", "props_decrypted")
    b = crypto.decrypt_verify(env, strategy="broadcast").select(
        "event_id", "props_decrypted"
    )
    rows_a = sorted((r.event_id, r.props_decrypted) for r in a.collect())
    rows_b = sorted((r.event_id, r.props_decrypted) for r in b.collect())
    assert rows_a == rows_b


def test_broadcast_strategy_keeps_row_path_jvm_only(spark, sf_dir):
    """The broadcast unwrap must leave no Python eval node on the fact-row
    side — ArrowEvalPython may appear only under the tiny distinct-keys
    branch feeding the broadcast exchange."""
    from dataflow_pubsub_message_encryption_spark.plans import formatted_plan

    env = with_envelope(load_events(spark, sf_dir))
    df = crypto.decrypt_verify(env, strategy="broadcast")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan


def test_aes_roundtrip_unicode_payloads(spark):
    """Envelope crypto must round-trip non-ASCII payloads byte-exactly
    (zh documents, emoji, combining chars)."""
    payloads = ["中文文本测试", "héllo wörld", "👍🏽🚀", 'json={"k": "値"}']
    key = crypto.dek(2)
    df = spark.createDataFrame([(p,) for p in payloads], "x STRING")
    out = df.select(
        "x",
        F.aes_decrypt(
            F.aes_encrypt(F.col("x").cast("binary"), F.lit(key)), F.lit(key)
        ).cast("string").alias("rt"),
    )
    assert all(r.x == r.rt for r in out.collect())


def test_broadcast_strategy_rejected_on_streams(spark, sf_dir, tmp_path):
    import glob
    import shutil as sh

    import pytest as _pytest

    from dataflow_pubsub_message_encryption_spark import streaming as st
    from dataflow_pubsub_message_encryption_spark.sources import with_envelope as we

    sh.copy(glob.glob(f"{sf_dir}/events.parquet")[0], str(tmp_path / "e.parquet"))
    stream = st.events_file_stream(spark, str(tmp_path))
    env = we(stream)
    with _pytest.raises(ValueError, match="cached_udf"):
        crypto.decrypt_verify(env, strategy="broadcast")


def test_hmac_udf_rfc4231_vectors(spark):
    """RFC 4231 HMAC-SHA256 test vectors through the Spark UDF path."""
    vectors = [
        (  # test case 1
            b"\x0b" * 20,
            "Hi There",
            "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7",
        ),
        (  # test case 2
            b"Jefe",
            "what do ya want for nothing?",
            "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843",
        ),
    ]
    for key, msg, want in vectors:
        udf = crypto.make_hmac_udf(key)
        got = (
            spark.range(1)
            .select(udf(F.lit(msg)).alias("h"))
            .collect()[0]
            .h
        )
        assert got == want, f"RFC 4231 mismatch for key={key!r}"


def test_hmac_udf_matches_stdlib_on_fixture(spark, sf_dir):
    import hmac as _hmac

    rows = (
        load_events(spark, sf_dir)
        .limit(50)
        .select("props", crypto.hmac_col(F.col("props")).alias("h"))
        .collect()
    )
    key = crypto.MAC_KEY.encode()
    for r in rows:
        assert r.h == _hmac.digest(key, r.props.encode(), "sha256").hex()


def test_hmac_differs_from_sha2_model(spark, sf_dir):
    """The two MAC modes must not be interchangeable (hmac != sha2(k||p))."""
    row = (
        load_events(spark, sf_dir)
        .limit(1)
        .select(
            crypto.hmac_col(F.col("props")).alias("h"),
            crypto.mac_col(F.col("props")).alias("s"),
        )
        .collect()[0]
    )
    assert row.h != row.s


def test_hmac_tamper_detection_drops_rows(spark, sf_dir):
    events = load_events(spark, sf_dir)
    n = events.count()
    env = with_envelope(events, tamper=True, mac_mode="hmac")
    survivors = crypto.decrypt_verify(env, mac_mode="hmac")
    ids = [r.event_id for r in survivors.select("event_id").collect()]
    assert len(ids) == n // 2
    assert all(i % 2 == 0 for i in ids)
