"""Portable Count-Min sketch — frequency estimation whose state is a
fixed ``depth × width`` integer grid no matter how large the stream.

The repo's other sketches (q63 HLL, q64 KLL-style quantiles) ride
Spark's built-ins, whose register layouts are engine-internal and hence
oracle-checkable only by error bound. This CMS is built from the
engine-portable md5 hash family (functions/hashing.py) instead: every
cell and every estimate is a pure function of the input multiset, so a
SQL oracle recomputes the ENTIRE sketch bit-for-bit — the same
determinism contract as the banded-MinHash path vs pyspark.ml LSH.

Guarantees (standard CM): estimate ≥ true count always (never
undercounts), and overcount ≤ εN with probability 1-δ for
width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Scale: the build is ONE map-side-combined aggregate — each task folds
its rows into ≤ depth·width partial cells, the shuffle carries at most
depth·width rows per task regardless of input size, and sketches of
disjoint corpus parts MERGE by cell-wise addition (the property that
makes CMS the right heavy-hitter primitive at 100 TB, where an exact
per-key count table is itself a giant shuffle). Estimation joins the
fixed-size sketch broadcast-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.hashing import hash64


def _bucket(key, row: int, width: int):
    """Row-``row``'s bucket for ``key``: portable md5 hash64 of
    ``"{row}:" || key``, reduced mod width — the seeded_md5 scheme every
    deterministic operator in the repo derives hashes from."""
    return hash64(F.concat(F.lit(f"{row}:"), key.cast("string"))) % width


def _cell_array(key, width: int, depth: int):
    """The depth cell addresses ``(row, bucket)`` for ``key`` — ONE
    definition used by both build and estimate, so the two sides can
    never drift to different cells (which would silently break the
    never-undercount guarantee)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(key, r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 3,
    count_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of ``key_col``'s frequencies: one output row per
    non-empty cell ``(row, bucket, cnt)`` — at most depth·width rows.
    Each input row contributes one increment per hash row via a
    depth-way explode (a narrow projection), then one aggregate.

    ``count_col`` feeds a PRE-AGGREGATED (key, count) table instead of a
    raw stream: cell values are Σ counts, bit-identical to the streaming
    build (CMS cells are sums — the same mergeability that lets partial
    sketches add cell-wise)."""
    cells = _cell_array(F.col(key_col), width, depth)
    inc = F.lit(1) if count_col is None else F.col(count_col)
    return (
        df.select(inc.alias("__inc"), F.explode(cells).alias("__c"))
        .groupBy(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
        .agg(F.sum("__inc").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 3,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the estimate is
    the MIN over hash rows of the addressed cells (a key hashing to an
    untouched cell reads 0 — the coalesce covers sparse sketches).
    The sketch is fixed-size → broadcast; the probe side stays
    shuffle-free. ``width``/``depth`` must match the build."""
    probes = keys.select(
        key_col,
        F.explode(_cell_array(F.col(key_col), width, depth)).alias("__p"),
    ).select(key_col, F.col("__p.row").alias("row"), F.col("__p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def bloom_positions(
    df: DataFrame, key_col: str, width: int = 1 << 18, depth: int = 3
) -> DataFrame:
    """Build side of a portable Bloom filter: the DISTINCT ``(row,
    bucket)`` cells the key set lights up — a partitioned Bloom (depth
    independent width-bit arrays), same md5 cell addressing as the CMS
    (``_cell_array``), so any engine recomputes the filter exactly. At
    most depth·|keys| rows, typically ≪ width·depth; one map-side-
    combined distinct."""
    return (
        df.select(F.explode(_cell_array(F.col(key_col), width, depth)).alias("__c"))
        .select(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
        .distinct()
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    positions: DataFrame,
    width: int = 1 << 18,
    depth: int = 3,
) -> DataFrame:
    """Probe side: keep rows whose key lights ALL ``depth`` cells of
    ``positions`` — no false negatives (every true match survives),
    false positives at the standard Bloom rate (~(fill)^depth), to be
    finished by the real join downstream.

    THE 100 TB semi-join reduction: instead of shuffling a full fact
    table into a join against a selective key set, the fixed-size
    position table broadcasts and the facts are trimmed by ``depth``
    MAP-SIDE broadcast left-semi joins — the fact side never
    exchanges. ``positions`` is materialized here (key-set-bounded):
    each of the depth join legs consumes it, and without the checkpoint
    the build-side distinct would re-run per leg (the exchange-reuse
    lesson). ``width``/``depth`` must match the build."""
    positions = positions.localCheckpoint(eager=True)
    out = df
    for r in range(depth):
        # __-prefixed alias: an unqualified "bucket" would be ambiguous
        # against a probe frame that carries its own bucket column
        pos_r = positions.filter(F.col("row") == r).select(
            F.col("bucket").alias("__bucket")
        )
        out = out.join(
            F.broadcast(pos_r),
            _bucket(F.col(key_col), r, width) == F.col("__bucket"),
            "left_semi",
        )
    return out
