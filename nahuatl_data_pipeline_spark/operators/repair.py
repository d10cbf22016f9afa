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
