"""Bucketed-table co-located join: the claimed 100 TB shuffle elimination,
demonstrated — orders and lineitem bucketed on the join key join with NO
exchange on either side."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from dataflow_pubsub_message_encryption_spark.plans import (
    count_exchanges,
    formatted_plan,
)
from dataflow_pubsub_message_encryption_spark.sources import load


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sparkgraft-bucket-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmpdir):
    suffix = uuid.uuid4().hex[:8]
    to_name, ln_name = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # fixture tables are tiny -> auto-broadcast would bypass the bucketed
    # path this test exists to exercise (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        (
            load(spark, sf_dir, "orders")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", f"{tmpdir}/{to_name}")
            .saveAsTable(to_name)
        )
        (
            load(spark, sf_dir, "lineitem")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", f"{tmpdir}/{ln_name}")
            .saveAsTable(ln_name)
        )
        o = spark.table(to_name)
        li = spark.table(ln_name)
        joined = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        # both sides read pre-bucketed: the only exchange is the final agg's
        n_ex = count_exchanges(joined)
        assert n_ex == 1, f"bucketed join must not shuffle join inputs: {n_ex}"
        # and the result matches the unbucketed join
        base = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, base.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {to_name}")
        spark.sql(f"DROP TABLE IF EXISTS {ln_name}")
