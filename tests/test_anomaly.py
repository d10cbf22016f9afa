"""zscore_outliers unit tests (operators/anomaly.py): planted outlier
detection, degenerate groups, and the broadcast-stats plan."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.anomaly import zscore_outliers


def _metrics(spark, rows):
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    return spark.createDataFrame(pdf, schema="g string, v double")


def test_planted_outlier_is_flagged(spark):
    rows = [("a", float(x)) for x in range(20)] + [("a", 1000.0)]
    out = zscore_outliers(_metrics(spark, rows), ["g"], "v", threshold=3.0)
    flagged = [r["v"] for r in out.filter(F.col("is_outlier")).collect()]
    assert flagged == [1000.0]


def test_degenerate_groups_flag_nothing(spark):
    rows = [("single", 5.0), ("const", 2.0), ("const", 2.0), ("const", 2.0)]
    out = zscore_outliers(_metrics(spark, rows), ["g"], "v")
    assert out.filter(F.col("is_outlier")).count() == 0
    # z undefined -> null zscore, never a crash
    assert out.filter(F.col("zscore").isNull()).count() == 4


def test_stats_join_is_broadcast(spark):
    df = _metrics(spark, [("a", float(i)) for i in range(50)])
    plan = (
        zscore_outliers(df, ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
