"""Dynamic partition pruning: the runtime analogue of static partition
pruning. A fact table partitioned on a join key must NOT be fully
scanned when the dim side of the join is filtered — Spark injects the
dim's matched key set as a runtime partition filter
(``dynamicpruning`` subquery in the scan's PartitionFilters). At
100 TB this is the difference between scanning 3 years of partitions
and scanning the two months the dim filter actually selects.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "orders_by_status")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    return path


def _status_dim(spark):
    # tiny dim carrying one selected status; broadcast side of the join
    return spark.createDataFrame(
        [("F", "finished")], ["status", "label"]
    )


def test_dpp_filter_injected_into_scan(spark, partitioned_orders):
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.read.parquet(partitioned_orders)
    dim = _status_dim(spark).filter(F.col("label") == "finished")
    joined = fact.join(
        F.broadcast(dim), fact["o_orderstatus"] == dim["status"]
    ).groupBy("o_orderstatus").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:4000]


def test_dpp_result_matches_static_filter(spark, partitioned_orders):
    fact = spark.read.parquet(partitioned_orders)
    dim = _status_dim(spark)
    via_join = (
        fact.join(F.broadcast(dim), fact["o_orderstatus"] == dim["status"])
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    direct = (
        fact.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    assert sorted(map(tuple, via_join)) == sorted(map(tuple, direct))
