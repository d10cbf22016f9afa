"""Time-series downsampling (OHLC bars) and categorical transition
counts — the batch analytics a metrics/trading-style event table needs
on top of the window/rollup family.

Reference anchor: the reference's stats layer resamples per-day counts
driver-side in pandas (benchmark/generate_stats.py); here downsampling
is a single map-side-combined aggregate keyed by (series, bucket) — at
100 TB that is one shuffle whose width is the OUTPUT bar count, not the
input row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ohlc_downsample(
    df: DataFrame,
    ts: str,
    value: str,
    by: list[str],
    width: str = "1 hour",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Downsample a point series to open/high/low/close/volume bars of
    ``width`` per ``by`` key.

    open/close are ``min_by``/``max_by`` over a (ts, *tiebreak) struct —
    ONE hash aggregate with map-side partial combine (each mapper folds
    its rows to at most one candidate per bar before the shuffle), never
    a row_number window that would sort whole partitions. ``tiebreak``
    makes equal-timestamp rows deterministic (pass a unique id column);
    struct ordering is lexicographic, identical to a multi-column SQL
    ORDER BY.

    Bars are epoch-aligned tumbling windows (``F.window``); ``bar_ts``
    is the bar's inclusive start.
    """
    order: Column = F.struct(F.col(ts), *[F.col(c) for c in tiebreak or []])
    return (
        df.groupBy(*by, F.window(ts, width).start.alias("bar_ts"))
        .agg(
            F.min_by(value, order).alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max_by(value, order).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
    )


def transition_counts(
    df: DataFrame,
    by: str,
    state: str,
    order_by: list[str],
) -> DataFrame:
    """Markov transition counts: for each ``by`` entity's event sequence
    (ordered by ``order_by``, which must be a deterministic total order
    — include a unique id as tiebreak), count (previous state → state)
    pairs across the whole table.

    Plan: one window shuffle keyed by ``by`` for the LAG, then a
    (prev, next)-keyed aggregate whose width is |states|² — at 100 TB
    the second shuffle carries partial counts only. First event per
    entity has no predecessor and is excluded.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("prev_state", F.lag(state).over(w))
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", F.col(state).alias("next_state"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
