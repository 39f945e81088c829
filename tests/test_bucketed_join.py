"""Bucketed-table co-located join: the shuffle-free fact-fact join.

At 100 TB the dominant cost of a repeated fact-fact join (orders x
lineitem on orderkey, silver-dedup anti joins, etc.) is re-shuffling
both sides on every run. Writing both tables bucketed on the join key
pre-partitions them ON DISK: Spark's scan reports the bucketing as an
output partitioning, and the join planner skips both Exchanges. This
test pins that contract - same join, bucketed inputs, ZERO shuffles -
so a regression in our session confs or write path that silently
reintroduces the shuffle fails CI, not the cluster bill.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture
def bucketed_tables(spark):
    """Write orders/lineitem bucketed by the join key into the session
    catalog; drop them afterwards."""
    tag = uuid.uuid4().hex[:8]
    to, tl = f"orders_b_{tag}", f"lineitem_b_{tag}"
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .saveAsTable(to)
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .saveAsTable(tl)
    )
    yield to, tl
    spark.sql(f"DROP TABLE IF EXISTS {to}")
    spark.sql(f"DROP TABLE IF EXISTS {tl}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    to, tl = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(to)
        li = spark.table(tl)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side: the only
        # Exchange allowed in the whole plan is the one feeding the
        # final single-key aggregation.
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert "SortMergeJoin" in plan, plan
        assert n_exchanges <= 1, plan
        # and it must still compute the right thing
        unbucketed = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, unbucketed.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
