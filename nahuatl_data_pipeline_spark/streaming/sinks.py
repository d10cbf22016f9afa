"""Streaming sinks (SURVEY.md §2.11 extension): land a stream into the
JDBC bulk-insert path (S11) and into partitioned parquet, with exactly
the retry semantics of the batch sink.

Spark has no built-in streaming JDBC sink; the canonical pattern is
``foreachBatch`` — each micro-batch arrives as an ordinary DataFrame and
goes through the SAME ``bulk_insert`` executor the batch path uses
(retry/backoff, batchsize, dialect driver), so the CDC loop the
reference runs as a cron script (``oracle_connector.py:95-241`` read →
transform → executemany) becomes readStream → transform → foreachBatch
with checkpointed exactly-once* bookkeeping (*at-least-once into the DB;
pair with a unique key or staging-table merge for exactly-once).

Scale notes: each micro-batch write is a normal distributed
``df.write.jdbc`` — per-partition connections, ``batchsize`` batching;
checkpointing bounds replay. The epoch id is exposed to the batch hook
for idempotent targets (write epoch → dedupe on (epoch, key))."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from nahuatl_data_pipeline_spark.sources.jdbc import bulk_insert


def jdbc_batch_writer(
    url: str,
    table: str,
    dialect: str = "postgresql",
    batchsize: int = 10_000,
    retries: int = 3,
    extra_options: dict[str, str] | None = None,
    epoch_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` hook writing each micro-batch via
    :func:`bulk_insert`. ``epoch_col`` (optional) stamps the batch's
    epoch id into a column so an idempotent target can dedupe replays
    after checkpoint recovery."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_col is not None:
            from pyspark.sql import functions as F

            batch_df = batch_df.withColumn(epoch_col, F.lit(epoch_id))
        bulk_insert(
            batch_df, url, table, dialect=dialect, batchsize=batchsize,
            retries=retries, extra_options=extra_options,
        )

    return write


def write_stream_jdbc(
    stream_df: DataFrame,
    url: str,
    table: str,
    checkpoint_dir: str,
    dialect: str = "postgresql",
    batchsize: int = 10_000,
    extra_options: dict[str, str] | None = None,
    epoch_col: str | None = None,
    available_now: bool = True,
    query_name: str = "jdbc_sink",
) -> StreamingQuery:
    """readStream → … → JDBC. ``available_now=True`` drains the current
    backlog then stops (the triggered-incremental mode matching the
    reference's cron cadence); False runs continuously."""
    writer = (
        stream_df.writeStream.foreachBatch(
            jdbc_batch_writer(
                url, table, dialect, batchsize,
                extra_options=extra_options, epoch_col=epoch_col,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
