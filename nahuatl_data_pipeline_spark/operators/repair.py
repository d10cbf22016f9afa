"""Data repair: forward-fill (LOCF) over ordered per-key streams.

Sensor/metric feeds arrive with gaps; last-observation-carried-forward
is the standard repair before windowed analysis. Expressed as one
window per key — ``F.last(col, ignorenulls=True)`` over rows-unbounded-
preceding — so the fill is a single key-partitioned shuffle with no
Python, no self-join, and no driver state. Each key's timeline must fit
a task's window spill budget (true of any per-entity stream; Spark's
window operator spills to disk past memory), and keys are independent,
so 1000 executors fill 1000 key ranges concurrently.

``fill_backward`` is the mirror (next-observation-carried-backward)
via a descending order — used for leading gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_forward(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    cols: list[str],
) -> DataFrame:
    """Replace nulls in ``cols`` with the most recent non-null value of
    the same key ordered by ``order_col``. Leading nulls (no prior
    observation) stay null — compose with :func:`fill_backward` to
    close them."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def fill_backward(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    cols: list[str],
) -> DataFrame:
    """Mirror of :func:`fill_forward`: nulls take the NEXT non-null
    observation (descending order, same single-shuffle plan)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def interpolate_fill(
    df: DataFrame,
    key_cols: list[str],
    slot_col: str,
    value_col: str,
) -> DataFrame:
    """Densify integer-slotted series per key and LINEARLY interpolate
    interior gaps — the repair tier above LOCF (``fill_forward``
    carries the last value flat; this one draws the line between the
    neighbors, the right call for continuously-varying metrics like
    rates or prices resampled onto a regular grid).

    Input: at most one row per (keys, slot), slots integer (the caller
    buckets timestamps — e.g. epoch-hours); missing slots are CREATED.
    Output per (keys, slot) of the dense per-key [min..max] spine:
    ``v_filled`` (observed, interpolated, or edge-clamped to the
    nearest observation) and ``was_gap``.

    Scale shape: the spine comes from a tiny per-key bounds aggregate
    exploded via ``sequence`` (never a driver-side range), joined back
    key-partitioned; the four neighbor lookups are TWO logical window
    passes over (keys ORDER BY slot) — Catalyst evaluates the forward
    and backward frames in one sort each, no self-join, no Python.
    Gap math is exact integer arithmetic; only the value lerp is
    floating."""
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(slot_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy(*key_cols)
        .orderBy(slot_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    bounds = df.groupBy(*key_cols).agg(
        F.min(slot_col).alias("__lo"), F.max(slot_col).alias("__hi")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(F.sequence("__lo", "__hi")).alias(slot_col),
    )
    v = F.col(value_col)
    obs_slot = F.when(v.isNotNull(), F.col(slot_col))
    j = (
        spine.join(
            df.select(*key_cols, slot_col, value_col),
            [*key_cols, slot_col],
            "left",
        )
        .withColumn("__pv", F.last(value_col, ignorenulls=True).over(w_fwd))
        .withColumn("__ps", F.last(obs_slot, ignorenulls=True).over(w_fwd))
        .withColumn("__nv", F.first(value_col, ignorenulls=True).over(w_bwd))
        .withColumn("__ns", F.first(obs_slot, ignorenulls=True).over(w_bwd))
    )
    frac = (F.col(slot_col) - F.col("__ps")).cast("double") / (
        F.col("__ns") - F.col("__ps")
    ).cast("double")
    lerp = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac
    return j.select(
        *key_cols,
        slot_col,
        F.when(v.isNotNull(), v)
        .when(
            F.col("__pv").isNotNull() & F.col("__nv").isNotNull(), lerp
        )
        .otherwise(F.coalesce("__pv", "__nv"))
        .alias("v_filled"),
        v.isNull().alias("was_gap"),
    )
