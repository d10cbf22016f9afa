"""Robustness: every registered query must run (not crash) on EMPTY input
tables — at 100 TB a filter chain routinely leaves some partition, date
range, or whole table empty, and an operator that throws on zero rows is
a production incident."""

from __future__ import annotations

import pytest

from nahuatl_data_pipeline_spark import registry
from nahuatl_data_pipeline_spark.schemas import TESTDATA_TABLES, load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    # events needs the nanos conf set before a raw read
    load_table(spark, SF_SMOKE, "events")
    for t in TESTDATA_TABLES:
        spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").limit(0).write.parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = registry.queries()[name](spark, empty_sf_dir)
    n = df.count()
    # row-producing queries must yield 0 rows; pure aggregates may yield
    # their single (empty-input) row — either way, no exception
    assert n >= 0
