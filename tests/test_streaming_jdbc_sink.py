"""Streaming → JDBC sink: file stream drains through foreachBatch into
embedded Derby, checkpoint makes the drain resumable, and new files land
as a delta on restart."""

from __future__ import annotations

from nahuatl_data_pipeline_spark.sources.jdbc import IncrementalJdbcSource
from nahuatl_data_pipeline_spark.streaming.sinks import write_stream_jdbc

SCHEMA = "id long, updated_at string, payload string"
CT = {"createTableColumnTypes": "updated_at VARCHAR(32), payload VARCHAR(64)"}


def _write_files(spark, d, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d)


def _db_rows(spark, url):
    src = IncrementalJdbcSource(
        url=url, table="STREAMED", watermark_col="updated_at",
        dialect="derby", num_partitions=1,
    )
    return sorted(r["id"] for r in src.load(spark, "").collect())


def test_stream_drains_to_jdbc_and_resumes(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    url = f"jdbc:derby:{tmp_path}/stream_db;create=true"

    _write_files(spark, src_dir, [(1, "2024-01-01 08:00:00", "a"),
                                  (2, "2024-01-01 09:00:00", "b")])
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = write_stream_jdbc(
        stream, url, "STREAMED", ckpt, dialect="derby",
        extra_options=CT, epoch_col=None,
    )
    q.awaitTermination()
    assert _db_rows(spark, url) == [1, 2]

    # restart with new backlog: checkpoint replays only the NEW file
    _write_files(spark, src_dir, [(3, "2024-01-02 08:00:00", "c")])
    stream2 = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q2 = write_stream_jdbc(
        stream2, url, "STREAMED", ckpt, dialect="derby", extra_options=CT,
    )
    q2.awaitTermination()
    assert _db_rows(spark, url) == [1, 2, 3]  # no duplicates of 1/2


def test_epoch_column_stamped_for_idempotent_targets(spark, tmp_path):
    src_dir = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ckpt2")
    url = f"jdbc:derby:{tmp_path}/epoch_db;create=true"
    _write_files(spark, src_dir, [(1, "2024-01-01 08:00:00", "a")])
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    ct = {"createTableColumnTypes":
          "updated_at VARCHAR(32), payload VARCHAR(64)"}
    q = write_stream_jdbc(
        stream, url, "STREAMED", ckpt, dialect="derby",
        extra_options=ct, epoch_col="epoch",
    )
    q.awaitTermination()
    src = IncrementalJdbcSource(
        url=url, table="STREAMED", watermark_col="updated_at",
        dialect="derby", num_partitions=1,
    )
    rows = src.load(spark, "").collect()
    assert rows and all(r["epoch"] is not None for r in rows)
