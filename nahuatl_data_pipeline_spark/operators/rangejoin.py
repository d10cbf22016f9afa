"""Distributed interval (range-containment) join — the second
point-in-time primitive training pipelines need (label windows, session
attribution, time-bounded feature aggregation).

A naive ``ON key = key AND start <= ts AND ts <= end`` degenerates to a
BroadcastNestedLoopJoin / cartesian theta join in Spark. The scalable
formulation BUCKETIZES time: each point lands in one fixed-width bucket,
each interval EXPLODES into the buckets it covers, and the join becomes
an ordinary hash equi-join on (key, bucket) + an exact containment
filter. Each (point, interval) match occurs in exactly ONE bucket — the
point's own — so no dedup pass is needed.

Cost: shuffle on (key, bucket) — co-partitioned, skew-resistant as long
as ``bucket_width`` is of the same order as typical interval length
(an interval explodes into span/width + 1 rows; width is the dial
between explode volume and bucket fan-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"
_PID = "__rj_pid"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    by: list[str],
    start: str,
    end: str,
    bucket_width_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row of the same ``by`` key
    whose ``[start, end]`` (inclusive both ends) contains ``points.on``.

    Timestamp columns throughout; ``bucket_width_s`` sets the equi-join
    granularity. ``how``: 'inner' (matches only) or 'left_semi' (points
    that fall in ANY interval — e.g. keep-list filtering).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"how must be inner|left_semi, got {how!r}")
    clash = (set(intervals.columns) - set(by)) & set(points.columns)
    if clash:
        raise ValueError(
            f"interval columns {sorted(clash)} collide with point columns"
            " — rename one side before joining"
        )
    p_bucket = F.floor(F.unix_timestamp(F.col(on)) / bucket_width_s)
    # surrogate row id: left_semi must preserve input MULTIPLICITY —
    # deduping on content columns would collapse identical point rows
    p = points.withColumn(_BUCKET, p_bucket).withColumn(
        _PID, F.monotonically_increasing_id()
    )

    s_b = F.floor(F.unix_timestamp(F.col(start)) / bucket_width_s)
    e_b = F.floor(F.unix_timestamp(F.col(end)) / bucket_width_s)
    iv = (
        intervals.filter(F.col(end) >= F.col(start))  # guard inverted spans
        .withColumn(_BUCKET, F.explode(F.sequence(s_b, e_b)))
    )

    cond = F.col(on).between(F.col(start), F.col(end))
    joined = p.join(iv, on=by + [_BUCKET], how="inner").filter(cond)
    if how == "left_semi":
        # containment already applied; one output row per INPUT row that
        # matched any interval (dedup on the surrogate id, not content)
        return (
            joined.select(p.columns)
            .dropDuplicates([_PID])
            .drop(_BUCKET, _PID)
        )
    return joined.drop(_BUCKET, _PID)
