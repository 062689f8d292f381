"""Bucketed co-located joins: the pre-shuffled 100 TB join path.

Asserts the *plan shape*, not just the result: joining two tables
bucketed on the join key must produce zero shuffle Exchanges, and with
sortBy metadata no per-task Sort either.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark.operators.bucketing import (
    bucketed_equi_join,
    write_bucketed,
)

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderstatus"
    )
    write_bucketed(li, "li_b", "l_orderkey", N_BUCKETS,
                   sort_cols=["l_orderkey"], path=str(base / "li"))
    write_bucketed(orders, "ord_b", "l_orderkey", N_BUCKETS,
                   sort_cols=["l_orderkey"], path=str(base / "ord"))
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_equi_join(spark, left, right, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: no shuffle on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_equi_join(spark, left, right, "l_orderkey").count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table(left).groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
