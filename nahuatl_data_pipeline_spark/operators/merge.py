"""Snapshot merge operators: SCD1 upsert and SCD2 history merge.

The reference maintains its source registry by row-wise SQLite
``INSERT OR REPLACE`` (src/registry/store.py:41-66) and keeps no
history. A training-data pipeline at scale needs the same merge
semantics over parquet snapshots — applied as set operations, not
per-row statements:

- ``upsert`` (SCD type 1): updates win, new keys insert, untouched
  rows carry over. One anti-join (broadcast when the update batch is
  small, which is the overwhelmingly common CDC shape) + union — the
  base table is never shuffled.
- ``scd2_merge`` (SCD type 2): rows whose TRACKED attributes actually
  changed are superseded (``is_current=false``) and re-inserted as a
  new version; no-op updates (same attribute values) produce NO new
  version — change detection is a null-safe comparison of the tracked
  columns, so a CDC feed that re-sends unchanged rows does not bloat
  history.

Both return plain DataFrames: write them back with the parquet/ORC
sinks (sources/writers.py) — merge-on-read table formats are out of
scope, merge-as-dataframe is the engine-level contract they all share.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """SCD1 merge: ``updates`` replace base rows on ``keys``; base rows
    without a matching update carry over; update-only keys insert.
    Schemas must match (enforced by ``unionByName``). The join is
    key-only, so Catalyst broadcasts the (typically small) update batch
    and the base side streams through without a shuffle.
    """
    surviving = base.join(
        F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
    )
    return surviving.unionByName(updates.select(*base.columns))


def _changed_predicate(tracked: list[str]):
    """NOT(all tracked columns null-safe-equal) between ``b.`` and ``u.``
    aliases — null→value and value→null transitions count as changes."""
    eqs = [
        F.col(f"b.{c}").eqNullSafe(F.col(f"u.{c}")) for c in tracked
    ]
    return ~functools.reduce(lambda a, x: a & x, eqs)


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD2 merge of an update batch into a version-1 base snapshot.

    Output = one row per surviving version with ``version`` (1 = base,
    2 = superseding update) and ``is_current``:

    - key not in updates, or update identical on ``tracked`` → the base
      row stays current (v1, true);
    - tracked change → base row becomes history (v1, false) AND the
      update row lands as (v2, true);
    - brand-new key in updates → (v2, true) insert, no history row.

    Plan: the changed-key set comes from ONE inner join of base and
    updates on ``keys`` (update batch broadcast — CDC batches are small
    relative to the dimension), then the base scan is tagged by a
    broadcast semi-join membership. The base table crosses no shuffle.

    Preconditions: ``base`` holds one current row per key (a v1
    snapshot) and ``updates`` one row per key (dedupe a raw CDC feed
    first, e.g. ``operators/dedup.py:keep_last``).
    """
    attrs = [c for c in base.columns]
    # One broadcast inner join (map-only over base — the batch is the
    # build side) yields every matched pair; changed/matched key sets
    # are projections of it, each bounded by the batch size, so they
    # are themselves broadcastable. The base table never shuffles.
    pairs = base.alias("b").join(F.broadcast(updates.alias("u")), keys, "inner")
    changed_keys = pairs.filter(_changed_predicate(tracked)).select(
        *[F.col(f"b.{k}") for k in keys]
    )
    matched_keys = pairs.select(*[F.col(f"b.{k}") for k in keys])
    base_rows = (
        base.join(
            F.broadcast(changed_keys.withColumn("__chg", F.lit(1))), keys, "left"
        )
        .withColumn(version_col, F.lit(1))
        .withColumn(current_col, F.col("__chg").isNull())
        .drop("__chg")
    )
    new_keys = updates.select(*keys).join(
        F.broadcast(matched_keys), keys, "left_anti"
    )
    inserting_keys = changed_keys.unionByName(new_keys).distinct()
    new_rows = (
        updates.select(*attrs)
        .join(F.broadcast(inserting_keys), keys, "left_semi")
        .withColumn(version_col, F.lit(2))
        .withColumn(current_col, F.lit(True))
    )
    return base_rows.unionByName(new_rows)
