"""Bucketed co-located join: results equal the plain join AND the physical
plan contains no shuffle exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.sources.bucketing import (
    cobucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    items = spark.range(0, 3000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") % 13).alias("b")
    )
    write_bucketed(
        orders, "t_orders_b", ["k"], num_buckets=8,
        sort_cols=["k"], path=str(tmp_path / "ob"),
    )
    write_bucketed(
        items, "t_items_b", ["k"], num_buckets=8,
        sort_cols=["k"], path=str(tmp_path / "ib"),
    )
    yield "t_orders_b", "t_items_b", orders, items
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_cobucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt, orders, items = bucketed_tables
    joined = cobucketed_join(spark, lt, rt, ["k"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    # results identical to the plain (shuffling) join
    plain = sorted(map(tuple, orders.join(items, "k").collect()))
    got = sorted(map(tuple, joined.collect()))
    assert got == plain and len(got) == 3000
