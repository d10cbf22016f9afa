"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §4;
100 TB join strategy).

A fact⨝fact join (orders ⨝ lineitem at full scale) can't broadcast either
side; the default is a sort-merge join with BOTH sides shuffling every
run. Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key, and
every subsequent join reads bucket i against bucket i with no exchange —
the plan-level proof is asserted in tests/test_bucketing.py.

Spark bucketing metadata lives in the catalog, so these are
``saveAsTable`` managed/external tables, not bare parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sort_cols`` additionally sorts within each bucket file — a
    subsequent sort-merge join skips its sort too, and range predicates
    on the sort key benefit from rowgroup skipping.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata comes with it."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same keys/bucket-count: no exchange
    on either side (each task reads matching bucket files directly)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )
