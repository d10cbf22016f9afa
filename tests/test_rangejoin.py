"""Interval join: inclusive bounds, multi-bucket spans, semi mode, and
the no-cartesian plan guarantee."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.rangejoin import interval_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def frames(spark):
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [1, 2, 3, 4],
                "k": [1, 1, 1, 2],
                "ts": [_ts(0), _ts(30), _ts(45), _ts(30)],
            }
        ),
        schema="pid int, k int, ts timestamp",
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "s": [_ts(0), _ts(40), _ts(31)],
                "e": [_ts(30), _ts(50), _ts(59)],
                "wid": [10, 20, 30],
            }
        ),
        schema="k int, s timestamp, e timestamp, wid int",
    )
    return pts, iv


def test_inclusive_bounds_and_multi_bucket_span(spark, frames):
    pts, iv = frames
    # bucket width 10 min → interval [0,30] spans 4 buckets; matches must
    # appear exactly once each (no bucket-duplicate rows)
    got = sorted(
        (r["pid"], r["wid"])
        for r in interval_join(
            pts, iv, on="ts", by=["k"], start="s", end="e", bucket_width_s=600
        ).collect()
    )
    assert got == [
        (1, 10),  # start boundary inclusive
        (2, 10),  # end boundary inclusive
        (3, 20),
        # pid 4 (k=2, ts=30) is 1 min before window 30 opens → no match
    ]


def test_left_semi_keeps_point_rows_once(spark, frames):
    pts, iv = frames
    wide = iv.withColumn("e", F.col("e") + F.expr("INTERVAL 60 MINUTES"))
    out = interval_join(
        pts, wide, on="ts", by=["k"], start="s", end="e",
        bucket_width_s=600, how="left_semi",
    )
    # pid 2/3 now fall in BOTH k=1 windows but appear once; pid 4 still
    # precedes its key's window start (widening the END can't help);
    # columns are exactly the point columns
    assert sorted(r["pid"] for r in out.collect()) == [1, 2, 3]
    assert set(out.columns) == {"pid", "k", "ts"}


def test_results_independent_of_bucket_width(spark, frames):
    pts, iv = frames
    a = sorted(
        map(tuple, interval_join(
            pts, iv, on="ts", by=["k"], start="s", end="e", bucket_width_s=60
        ).collect())
    )
    b = sorted(
        map(tuple, interval_join(
            pts, iv, on="ts", by=["k"], start="s", end="e",
            bucket_width_s=86400,
        ).collect())
    )
    assert a == b


def test_no_cartesian_in_plan(spark, frames):
    pts, iv = frames
    plan = (
        interval_join(pts, iv, on="ts", by=["k"], start="s", end="e")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_left_semi_preserves_duplicate_point_rows(spark, frames):
    pts, iv = frames
    doubled = pts.unionAll(pts)  # identical rows twice
    out = interval_join(
        doubled, iv, on="ts", by=["k"], start="s", end="e",
        bucket_width_s=600, how="left_semi",
    )
    # pids 1/2/3 match → each appears TWICE (input multiplicity kept)
    assert sorted(r["pid"] for r in out.collect()) == [1, 1, 2, 2, 3, 3]


def test_column_collision_raises(spark, frames):
    pts, iv = frames
    import pytest

    with pytest.raises(ValueError, match="collide"):
        interval_join(
            pts, iv.withColumnRenamed("wid", "pid"),
            on="ts", by=["k"], start="s", end="e",
        )
