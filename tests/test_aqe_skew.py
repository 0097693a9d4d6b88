"""AQE runtime re-planning: prove skew-join splitting actually fires.

A synthetic hot key (90% of rows) joins a dimension; with the skew
thresholds scaled down to fixture size, AQE must mark the sort-merge
join ``isSkew=true`` and split the hot partition — the runtime defense
the session config promises for 100 TB (session.py RUNTIME_CONF).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    # Disable BOTH broadcast paths (plan-time and AQE runtime): the
    # skew splitter only exists inside a sort-merge join, and the
    # session's 64m adaptive threshold would otherwise convert this
    # 100-row dim join to broadcast at runtime.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    for k, v in prev.items():
        spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # 200k rows, 90% on key 0; dimension of 100 keys
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    joined = fact.join(dim, "k")
    # collect() executes THIS DataFrame's query execution (count() would
    # build and execute a different plan), giving us the AQE final plan
    assert len(joined.collect()) == 200_000
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "skew=true" in final_plan, final_plan[:2000]
