"""Regression: load_table must handle every physical layout the events
table has shipped with across testdata generations.

Round 3 lost 5 driver queries, the bench, and the suite because the
driver regenerated events.parquet with ``ts: timestamp[us]`` while
``load_table`` unconditionally applied the TIMESTAMP(NANOS)→LongType
workaround. The fix dispatches on the decoded dtype; this test pins all
three layouts so an environment drift can never silently recur.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from nahuatl_data_pipeline_spark.schemas import load_table
from tests.conftest import SF_SMOKE

_EVENTS_TS = [
    datetime.datetime(2024, 1, 1, 12, 0, 0, 123456),
    datetime.datetime(2024, 6, 15, 23, 59, 59, 999999),
    datetime.datetime(2025, 3, 3, 0, 0, 1),
]


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    """Write a minimal events.parquet with the given ts arrow type."""
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(['{"k":1}', "{}", "{}"]),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("ns"),  # legacy layout → Spark LongType under nanosAsLong
        pa.timestamp("us"),  # current layout → TIMESTAMP_NTZ
        pa.timestamp("us", tz="UTC"),  # adjusted-to-UTC → TimestampType
    ],
    ids=["nanos", "micros-ntz", "micros-utc"],
)
def test_events_ts_layouts_load_identically(spark, tmp_path, arrow_type):
    sf_dir = _write_events(
        str(tmp_path), pa.array(_EVENTS_TS, type=arrow_type)
    )
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(
        r["ts"] for r in df.select("ts").collect()
    )
    assert got == sorted(_EVENTS_TS)


@pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver-generated testdata absent"
)
def test_real_testdata_events_loads(spark):
    """The actual driver-generated table must load with a timestamp ts."""
    df = load_table(spark, SF_SMOKE, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert df.limit(1).count() == 1


def test_unknown_ts_dtype_fails_loudly(spark, tmp_path):
    """A fourth physical layout must raise at the read site, not surface
    as an obscure downstream window/unix_timestamp error (ADVICE r04)."""
    sf_dir = _write_events(
        str(tmp_path), pa.array(["2024-01-01T12:00:00"] * 3, pa.string())
    )
    with pytest.raises(TypeError, match="unexpected events.ts dtype"):
        load_table(spark, sf_dir, "events")


def test_ntz_cast_requires_utc_session(spark, tmp_path):
    """The NTZ→TimestampType relabel is only value-preserving under a
    UTC session timezone; a drifted session must fail loudly, not shift
    every event relative to the oracle (ADVICE r04)."""
    sf_dir = _write_events(
        str(tmp_path), pa.array(_EVENTS_TS, type=pa.timestamp("us"))
    )
    orig = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Mexico_City")
    try:
        with pytest.raises(ValueError, match="UTC session timezone"):
            load_table(spark, sf_dir, "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
