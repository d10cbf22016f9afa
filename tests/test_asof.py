"""As-of join semantics: inclusive backward match, forward direction,
tolerance staleness bound, left-join nulls, partition stability."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1, 1, 2], "ts": [3, 5, 10, 7], "v": [30, 50, 100, 70]}
        ),
        schema="k int, ts int, v int",
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "ts": [4, 10, 99], "ref": [400, 1000, 9900]}),
        schema="k int, ts int, ref int",
    )
    return left, right


def _rows(df):
    return sorted(
        (r["k"], r["ts"], r["v"], r["ref"]) for r in df.collect()
    )


def test_backward_inclusive_and_left_nulls(spark):
    left, right = _frames(spark)
    got = _rows(asof_join(left, right, on="ts", by=["k"]))
    # matches DuckDB ASOF LEFT JOIN exactly (verified): ts=10 matches the
    # equal-timestamp checkpoint (inclusive), ts=3 and k=2 have no match
    assert got == [
        (1, 3, 30, None),
        (1, 5, 50, 400),
        (1, 10, 100, 1000),
        (2, 7, 70, None),
    ]


def test_forward_direction(spark):
    left, right = _frames(spark)
    got = _rows(asof_join(left, right, on="ts", by=["k"], direction="forward"))
    assert got == [
        (1, 3, 30, 400),     # earliest right at-or-after 3 is ts=4
        (1, 5, 50, 1000),
        (1, 10, 100, 1000),  # inclusive
        (2, 7, 70, 9900),
    ]


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    got = _rows(
        asof_join(left, right, on="ts", by=["k"], tolerance=F.lit(2))
    )
    # ts=5 matched ts=4 (gap 1, kept); nothing else within 2
    assert got == [
        (1, 3, 30, None),
        (1, 5, 50, 400),
        (1, 10, 100, 1000),  # gap 0
        (2, 7, 70, None),
    ]


def test_partitioning_stability(spark):
    left, right = _frames(spark)
    a = _rows(asof_join(left, right, on="ts", by=["k"]))
    b = _rows(
        asof_join(left.repartition(7), right.repartition(5), on="ts", by=["k"])
    )
    assert a == b


def test_value_column_collision_raises(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("ref", "v"),
                  on="ts", by=["k"])


def test_single_shuffle_plan(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="ts", by=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + one window: exactly one hash exchange on the by key,
    # and definitely no cartesian/broadcast-nested-loop range join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_explicit_empty_value_cols_attaches_nothing(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by=["k"], value_cols=[])
    assert set(out.columns) == {"k", "ts", "v"}
    assert out.count() == left.count()
