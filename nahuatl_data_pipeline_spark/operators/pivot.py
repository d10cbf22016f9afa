"""Pivot / rollup reshaping operators.

Wide-format reporting views over long-format facts. The reference ships
these shapes as pandas ``pivot_table`` calls in its stats notebooks
(benchmark/generate_stats.py:150-170 builds per-status monthly matrices
driver-side); here they are distributed aggregates:

- ``pivot_agg`` — ``groupBy().pivot()`` with an EXPLICIT value list.
  Passing the values is not a convenience: without them Spark runs an
  EAGER distinct-scan job over the pivot column before it can even plan
  the aggregate, which at 100 TB is a full extra pass purely to
  discover category labels the caller already knows. With values
  supplied the build is lazy and the plan is two map-side-combined
  aggregates — the (keys, pivot) pre-aggregate and the per-key
  ``pivotfirst`` fold — so each shuffle carries one row per (group,
  category), never raw rows.
- ``rollup_agg`` — ``df.rollup()`` subtotal/grand-total aggregates with
  a ``grouping_id`` disambiguator. Rollup is evaluated as ONE shuffle
  producing all grouping sets (Spark expands sets map-side), so the
  subtotal levels cost far less than re-aggregating per level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_agg(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    pivot_values: list[str],
    agg: Column,
    prefix: str = "",
) -> DataFrame:
    """Wide aggregate: one row per ``group_cols``, one column per value
    in ``pivot_values`` (prefixed for schema stability), cells from
    ``agg``.

    ``pivot_values`` is required (see module docstring). Values absent
    from the data still yield columns (null cells) — the output schema
    is fixed by the call, never by data content, which is what a
    downstream contract needs.
    """
    out = df.groupBy(*group_cols).pivot(pivot_col, pivot_values).agg(agg)
    for v in pivot_values:
        out = out.withColumnRenamed(str(v), f"{prefix}{v}")
    return out


def _finalize_grouping(out, group_cols: list[str], total_label: str) -> DataFrame:
    """Shared grouping-sets finalization (cube/rollup/grouping-sets):
    coalesce rolled-up key columns to ``total_label`` (no ambiguous
    nulls) and pin the column order to keys + grouping_level + aggs."""
    for c in group_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(total_label)))
    cols = group_cols + ["grouping_level"] + [
        c for c in out.columns if c not in group_cols + ["grouping_level"]
    ]
    return out.select(*cols)


def cube_agg(
    df: DataFrame,
    cube_cols: list[str],
    aggs: list[Column],
    total_label: str = "ALL",
) -> DataFrame:
    """All 2^k grouping-set combinations of ``cube_cols`` (the full
    cross-tab, vs :func:`rollup_agg`'s prefix hierarchy). Same
    one-shuffle Expand plan and ``grouping_level`` bitmask contract as
    ``rollup_agg`` — the Expand factor is 2^k rows per input row, so
    keep k small at scale (2-3 dimensions; beyond that, aggregate the
    detail level once and roll up the tiny result instead)."""
    out = (
        df.cube(*cube_cols)
        .agg(F.grouping_id().alias("grouping_level"), *aggs)
    )
    return _finalize_grouping(out, cube_cols, total_label)


def grouping_sets_agg(
    df: DataFrame,
    group_cols: list[str],
    sets: list[list[str]],
    aggs: list[Column],
    total_label: str = "ALL",
) -> DataFrame:
    """Arbitrary grouping sets (the general form rollup/cube specialize):
    exactly the requested ``sets`` — e.g. two independent 1-D marginals
    WITHOUT the 2-D detail a cube would force — in ONE Expand shuffle,
    never one aggregate per set re-scanning the input. Same
    ``grouping_level`` bitmask + ``total_label`` coalescing contract as
    :func:`rollup_agg`/:func:`cube_agg`. Expand factor = len(sets), so
    cost is proportional to the sets you actually asked for.
    """
    out = df.groupingSets(sets, *group_cols).agg(
        F.grouping_id().alias("grouping_level"), *aggs
    )
    return _finalize_grouping(out, group_cols, total_label)


def rollup_agg(
    df: DataFrame,
    rollup_cols: list[str],
    aggs: list[Column],
    total_label: str = "ALL",
) -> DataFrame:
    """Hierarchical subtotals: one output row per prefix level of
    ``rollup_cols`` (detail → subtotal → grand total) plus a
    ``grouping_level`` bitmask (``F.grouping_id()`` — bit i set means
    rollup_cols[i] is rolled up; identical semantics to ANSI
    ``GROUPING()`` bit concatenation, so SQL oracles can reproduce it).
    Rolled-up key columns are coalesced to ``total_label`` so the output
    contains no ambiguous nulls (a null data value and a subtotal row
    would otherwise be indistinguishable).
    """
    out = (
        df.rollup(*rollup_cols)
        .agg(F.grouping_id().alias("grouping_level"), *aggs)
    )
    return _finalize_grouping(out, rollup_cols, total_label)


def topn_other(
    df: DataFrame,
    key_col: str,
    n: int,
    weight: Column | None = None,
    other_label: str = "OTHER",
) -> DataFrame:
    """Long-tail coalescing report: the ``n`` heaviest keys stay named,
    every other key folds into one ``other_label`` row — the "top-20
    tokens plus tail mass" shape behind vocabulary-coverage, domain-mix
    and error-budget dashboards, where the interesting signal is the
    head AND the aggregate size of the tail, not a million tiny rows.

    Two stages, both aggregate-shaped: (1) one map-side-combined count
    (or Σ``weight``) per key — the ONLY full-data shuffle; (2) a rank
    window + re-aggregate over the |keys|-row count table. The window
    is global-ordered but runs on key cardinality, not data volume —
    the same bounded-table argument as q113's CDF. Rank ties break by
    key ascending, so the head set is deterministic. Output per row:
    ``label``, ``total`` (Σ within label), ``n_keys`` (how many
    distinct keys the label covers — 1 for head rows).
    """
    from pyspark.sql import Window

    w = F.lit(1) if weight is None else weight
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.sum(w).alias("__cnt")
    )
    rw = Window.orderBy(F.desc("__cnt"), F.asc("__k"))
    return (
        counts.withColumn("__r", F.row_number().over(rw))
        .select(
            F.when(F.col("__r") <= n, F.col("__k"))
            .otherwise(F.lit(other_label))
            .alias("label"),
            "__cnt",
        )
        .groupBy("label")
        .agg(
            F.sum("__cnt").alias("total"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )
