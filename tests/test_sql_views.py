"""§3.3: the reference's SQL analytics run (nearly) verbatim under
spark.sql once the metadata views are registered — the engine's raw-SQL
query surface."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.plans.metadata import register_metadata_views
from nahuatl_data_pipeline_spark.schemas import (
    DATA_LINEAGE_SCHEMA,
    PIPELINE_RUNS_SCHEMA,
    QUALITY_METRICS_SCHEMA,
)


def _dt(d, h=0):
    return datetime.datetime(2024, 1, d, h)


@pytest.fixture()
def views(spark):
    runs = spark.createDataFrame(
        [
            (None, "r1", "unify", _dt(1), _dt(1, 1), "success", 100, 90, 10,
             3600.0, None, None, "{}"),
            (None, "r2", "unify", _dt(2), _dt(2, 1), "failed", 100, None, None,
             60.0, "boom", None, "{}"),
            (None, "r3", "unify", _dt(3), _dt(3, 1), "success", 200, 180, 20,
             1800.0, None, None, "{}"),
        ],
        PIPELINE_RUNS_SCHEMA,
    )
    metrics = spark.createDataFrame(
        [
            (None, "r1", "quality_score", 0.9, None, "train", _dt(1, 2)),
            (None, "r3", "quality_score", 0.95, None, "train", _dt(3, 2)),
            (None, "r3", "duplicate_rate", 0.02, None, "train", _dt(3, 2)),
        ],
        QUALITY_METRICS_SCHEMA,
    )
    lineage = spark.createDataFrame(
        [
            (None, "r1", "a.jsonl", "jsonl", "bronze", 100, 90, 10, _dt(1), None),
            (None, "r3", "b.jsonl", "jsonl", "bronze", 200, 180, 20, _dt(3), None),
        ],
        DATA_LINEAGE_SCHEMA,
    )
    register_metadata_views(spark, runs, metrics, lineage)
    return spark


def test_latest_quality_metrics_view_sql(views):
    rows = views.sql(
        "SELECT metric_name, metric_value FROM latest_quality_metrics "
        "ORDER BY metric_name"
    ).collect()
    # latest successful run is r3 → its two metrics
    assert [(r["metric_name"], r["metric_value"]) for r in rows] == [
        ("duplicate_rate", 0.02),
        ("quality_score", 0.95),
    ]


def test_pipeline_performance_view_sql(views):
    rows = views.sql(
        "SELECT run_date, successful_runs, failed_runs, total_records_output "
        "FROM pipeline_performance ORDER BY run_date"
    ).collect()
    assert len(rows) == 3
    assert rows[1]["failed_runs"] == 1 and rows[1]["successful_runs"] == 0
    assert rows[2]["total_records_output"] == 180


def test_lineage_summary_view_sql(views):
    row = views.sql(
        "SELECT records_ingested, records_valid, validity_pct "
        "FROM data_lineage_summary"
    ).collect()[0]
    assert row["records_ingested"] == 300 and row["records_valid"] == 270
    assert row["validity_pct"] == 90.0


def test_reference_style_adhoc_sql(views):
    """A quality_trends.sql-shaped ad-hoc query (CTE + window + LAG) over
    the registered tables, as raw SQL text."""
    out = views.sql(
        """
        WITH daily AS (
          SELECT DATE(measured_at) AS d, metric_name,
                 AVG(metric_value) AS avg_value
          FROM quality_metrics qm
          JOIN pipeline_runs pr ON qm.run_id = pr.run_id
          WHERE pr.status = 'success'
          GROUP BY 1, 2
        )
        SELECT d, metric_name, avg_value,
               AVG(avg_value) OVER (
                 PARTITION BY metric_name ORDER BY d
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma_7d,
               LAG(avg_value, 1) OVER (
                 PARTITION BY metric_name ORDER BY d) AS prev
        FROM daily ORDER BY metric_name, d
        """
    ).collect()
    qs = [r for r in out if r["metric_name"] == "quality_score"]
    assert len(qs) == 2
    assert qs[1]["prev"] == pytest.approx(0.9)
    assert qs[1]["ma_7d"] == pytest.approx((0.9 + 0.95) / 2)
