"""Bucketed tables: pre-shuffled storage layout so repeated joins on
the bucket key run with NO exchange — the co-located join strategy for
recurring 100 TB fact-fact joins (SCALE.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").saveAsTable("b_lineitem"))
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").saveAsTable("b_orders"))
    yield spark.table("b_lineitem"), spark.table("b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, orders = bucketed
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_correct(spark, bucketed):
    li, orders = bucketed
    n_bucketed = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    plain_li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain_o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n_plain = plain_li.join(plain_o, plain_li.l_orderkey == plain_o.o_orderkey).count()
    assert n_bucketed == n_plain
