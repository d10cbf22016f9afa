"""Distributed as-of (point-in-time) join — a training-data staple Spark
lacks as a builtin (feature lookups "as of" an event time, point-in-time
correctness for label joins).

Spark-first formulation: a range-condition join would explode into an
O(n·m) theta join, so instead both sides UNION into one stream tagged by
side, one window per ``by`` key forward-fills the latest right-side
payload, and left rows keep what was in scope at their timestamp:

    union → window(partitionBy=by, orderBy=(on, side)) → last(payload,
    ignorenulls) → filter side=left

Cost: ONE hash shuffle on ``by`` (the minimum any engine needs) + a
per-key sort — no cross product, no driver state. Right-side rows sort
BEFORE left rows at an equal timestamp, so the match is inclusive
(l.on >= r.on), identical to DuckDB/pandas ``ASOF JOIN`` semantics, which
is what the oracle checks (q52).

``tolerance`` bounds staleness (a match older than the window is nulled
out), mirroring ``pandas.merge_asof(tolerance=...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` (direction='backward', inclusive) or the
    earliest with ``right.on >= left.on`` ('forward'), per ``by`` key.

    ``value_cols`` default: every right column except ``on``/``by``.
    Unmatched left rows keep nulls (left-join semantics). ``tolerance``
    (e.g. ``F.expr("INTERVAL 1 HOUR")``) nulls out matches staler than
    the window.

    Right side should be unique per (by, on) — pre-aggregate if not; ties
    would otherwise resolve by arbitrary partition order in ANY engine.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if value_cols is None:  # [] is a valid explicit "attach nothing"
        value_cols = [c for c in right.columns if c != on and c not in by]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right value columns {sorted(clash)} collide with left columns"
            " — rename one side before joining"
        )

    payload = F.struct(
        F.col(on).alias("__on"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *by,
        F.col(on),
        payload.alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    l = left.withColumn(_SIDE, F.lit(1)).withColumn(
        _PAYLOAD, F.lit(None).cast(r.schema[_PAYLOAD].dataType)
    )
    u = l.unionByName(r, allowMissingColumns=True)

    order = (
        [F.col(on).asc(), F.col(_SIDE).asc()]
        if direction == "backward"
        else [F.col(on).desc(), F.col(_SIDE).asc()]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    matched_on = F.col(f"{_PAYLOAD}.__on")
    in_window = F.lit(True)
    if tolerance is not None:
        gap = (
            F.col(on) - matched_on
            if direction == "backward"
            else matched_on - F.col(on)
        )
        in_window = gap <= tolerance
    out = filled
    for c in value_cols:
        out = out.withColumn(
            c, F.when(in_window, F.col(f"{_PAYLOAD}.{c}"))
        )
    return out.drop(_SIDE, _PAYLOAD)
