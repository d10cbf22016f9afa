"""Every registered query with an oracle must hash-match DuckDB at sf0.01
(same protocol as the driver's correctness gate) and run at sf0.001.

Queries without an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from nahuatl_data_pipeline_spark import registry
from tests.conftest import SF_ORACLE, SF_SMOKE, assert_frames_match

ALL = sorted(registry.queries())
WITH_ORACLE = sorted(registry.oracle_sql())
NO_ORACLE = sorted(set(ALL) - set(WITH_ORACLE))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    fn = registry.queries()[name]
    sdf = fn(spark, SF_ORACLE)
    spark_pdf = sdf.toPandas()
    con = duck(SF_ORACLE)
    oracle_pdf = con.sql(registry.oracle_sql()[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
