"""S10/S11 integration: real df.write.jdbc → watermark-incremental read
round trip against embedded Derby (the in-process JDBC engine Spark
ships), covering batchsize options, resume-from-watermark, and the
escaped-literal path — the executable counterpart of the reference's
oracle_connector.py:95-241 CDC loop."""

from __future__ import annotations

import pytest

from nahuatl_data_pipeline_spark.sources.jdbc import (
    IncrementalJdbcSource,
    bulk_insert,
)


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _write_or_skip(df, url, table, **kw):
    try:
        bulk_insert(df, url, table, dialect="derby", **kw)
    except Exception as exc:  # pragma: no cover - env without derby jars
        if "derby" in str(exc).lower() and "ClassNotFound" in str(exc):
            pytest.skip("derby JDBC driver not on classpath")
        raise


def test_jdbc_write_then_incremental_read_roundtrip(spark, tmp_path):
    url = _derby_url(tmp_path, "cdc_db")
    batch1 = spark.createDataFrame(
        [
            (1, "2024-01-01 08:00:00", "a"),
            (2, "2024-01-01 09:00:00", "b"),
            (3, "2024-01-02 10:00:00", "c"),
        ],
        "id long, updated_at string, payload string",
    )
    # batchsize < rows exercises multi-batch executemany path; VARCHAR
    # column types because Derby's default string mapping (CLOB) is not
    # comparable to literals
    ct = {"createTableColumnTypes":
          "updated_at VARCHAR(32), payload VARCHAR(64)"}
    _write_or_skip(batch1, url, "EVENTS_CDC", batchsize=2, extra_options=ct)

    src = IncrementalJdbcSource(
        url=url,
        table="EVENTS_CDC",
        watermark_col="updated_at",
        dialect="derby",
        num_partitions=1,  # embedded engine: one plain query, no ranges
    )
    # full scan from epoch watermark
    all_rows = src.load(spark, "1970-01-01 00:00:00")
    assert all_rows.count() == 3

    # incremental: only rows past the bound (strict >)
    inc = src.load(spark, "2024-01-01 09:00:00")
    assert [r["id"] for r in inc.collect()] == [3]

    # resume contract: persist max(watermark) of what was processed,
    # append new rows, next sync reads exactly the delta
    last = all_rows.agg({"updated_at": "max"}).collect()[0][0]
    batch2 = spark.createDataFrame(
        [(4, "2024-01-03 07:00:00", "d"), (5, "2024-01-03 08:00:00", "e")],
        "id long, updated_at string, payload string",
    )
    bulk_insert(batch2, url, "EVENTS_CDC", dialect="derby", extra_options=ct)
    delta = src.load(spark, last)
    assert sorted(r["id"] for r in delta.collect()) == [4, 5]

    # quote in the watermark value: escaped literal stays one literal —
    # a valid query returning nothing, not an injection/SQL error
    assert src.load(spark, "2099-01-01' --").count() == 0


def test_bulk_insert_overwrite_and_append_modes(spark, tmp_path):
    url = _derby_url(tmp_path, "modes_db")
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    ct = {"createTableColumnTypes": "v VARCHAR(16)"}
    _write_or_skip(df, url, "T_MODES", extra_options=ct)
    bulk_insert(df, url, "T_MODES", dialect="derby", mode="append",
                extra_options=ct)
    src = IncrementalJdbcSource(
        url=url, table="T_MODES", watermark_col="v",
        dialect="derby", num_partitions=1,
    )
    assert src.load(spark, "a").count() == 2
    bulk_insert(df, url, "T_MODES", dialect="derby", mode="overwrite",
                extra_options=ct)
    assert src.load(spark, "a").count() == 1


def test_bulk_insert_retries_with_backoff_then_raises(spark, tmp_path):
    sleeps: list[float] = []
    df = spark.createDataFrame([(1,)], "id long")
    # no ;create=true and the database does not exist → connect error
    bad_url = f"jdbc:derby:{tmp_path}/does_not_exist_db"
    with pytest.raises(Exception):
        bulk_insert(
            df, bad_url, "T", dialect="derby",
            retries=3, backoff_s=0.5, sleep_fn=sleeps.append,
        )
    assert sleeps == [0.5, 1.0]  # linear backoff, no sleep after last try
