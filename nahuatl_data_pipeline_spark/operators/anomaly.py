"""Anomaly flagging over metric streams: per-group z-score outliers.

The monitoring sibling of the quality suite (operators/quality.py
checks static expectations; this flags statistical outliers): a value
is anomalous when it sits more than ``threshold`` standard deviations
from its group's mean — the standard first-line detector for broken
scrapers, unit mix-ups, and pipeline regressions in per-source /
per-event-type metrics.

Plan: ONE map-side-combined aggregate computes each group's (mean,
stddev) — group count rows, broadcast back onto the stream — then
flagging is a narrow projection. No row-level shuffle; 100 TB of
events costs one stats aggregate plus a scan.

Stats are rounded before the comparison on purpose: mean/stddev are
float folds whose last ulp depends on summation order (engine,
partitioning), and an unrounded threshold comparison would let that
ulp flip rows in and out of the anomaly set. Rounding pins the
comparison inputs so the flagged set is reproducible everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    threshold: float = 3.0,
    round_stats: int = 6,
) -> DataFrame:
    """Rows of ``df`` plus ``group_mean``, ``group_std``, ``zscore``
    (rounded) and ``is_outlier`` (|z| > threshold; groups with fewer
    than 2 rows or zero variance flag nothing — z undefined)."""
    v = F.col(value_col)
    stats = df.groupBy(*keys).agg(
        F.round(F.avg(v), round_stats).alias("group_mean"),
        F.round(F.stddev_samp(v), round_stats).alias("group_std"),
    )
    z = F.round(
        (v - F.col("group_mean")) / F.col("group_std"), round_stats
    )
    return (
        df.join(F.broadcast(stats), keys)
        .withColumn(
            "zscore",
            F.when(
                F.col("group_std").isNotNull() & (F.col("group_std") > 0), z
            ),
        )
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False)),
        )
    )
