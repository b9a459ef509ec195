"""AQE runtime evidence: the adaptive re-planning claimed throughout is
observable in executed plans — partition coalescing and skew-join
splitting actually fire."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.sources import load


def _final_plan(df) -> str:
    df.collect()  # materialize so AQE finalizes
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    """32 shuffle partitions over a 5-group aggregate -> AQE coalesces the
    post-shuffle read (AQEShuffleRead coalesced) instead of running 32
    near-empty reducers."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    df = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = _final_plan(df)
    assert "AQEShuffleRead" in plan, "AQE must re-read coalesced partitions"


def test_aqe_splits_skewed_join(spark):
    """A pathologically skewed join side (99% one key) under tightened
    skew thresholds -> AQE marks the sort-merge join skew=true and splits
    the hot partition instead of letting one task carry it."""
    conf_keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in conf_keys}
    for k, v in conf_keys.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 != 0, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        df = left.join(right, "k").groupBy("tag").agg(F.count("*").alias("n"))
        plan = _final_plan(df)
        assert "skew=true" in plan, "skew-join split must fire on the hot key"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_public_api_run_query(spark, sf_dir):
    import dataflow_pubsub_message_encryption_spark as eng

    names = eng.list_queries()
    assert "pipeline_end_to_end" in names and len(names) >= 78
    df = eng.run_query("join_broadcast", spark, sf_dir)
    assert df.count() == 25
    try:
        eng.run_query("nope", spark, sf_dir)
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
