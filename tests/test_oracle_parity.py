"""Every registered query with an oracle must hash-match DuckDB at sf0.01
(same protocol as the driver's correctness gate) and run at sf0.001.

Queries without an oracle get a rows-run smoke check.

SPARK_GRAFT_TEST_SLICE="i/k" restricts the parametrization to every
k-th query (round-robin by sorted index) so tools/run_tests_sharded.py
can spread this file — by far the suite's longest — across concurrent
pytest processes. The k slices partition the full set exactly; unset
means everything (the default for a plain `pytest tests/` run, and what
CI-of-record should use).
"""

from __future__ import annotations

import os

import pytest

from nahuatl_data_pipeline_spark import registry
from tests.conftest import SF_ORACLE, SF_SMOKE, assert_frames_match

_SLICE = os.environ.get("SPARK_GRAFT_TEST_SLICE")


def _slice_of(names: list[str]) -> list[str]:
    if not _SLICE:
        return names
    i, k = (int(x) for x in _SLICE.split("/"))
    if not 0 <= i < k:
        raise ValueError(f"bad SPARK_GRAFT_TEST_SLICE {_SLICE!r}")
    return [n for j, n in enumerate(names) if j % k == i]


ALL = sorted(registry.queries())
WITH_ORACLE = _slice_of(sorted(registry.oracle_sql()))
NO_ORACLE = _slice_of(sorted(set(ALL) - set(registry.oracle_sql())))


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


@pytest.mark.skipif(
    _SLICE is not None and not _SLICE.startswith("0/"),
    reason="unparametrized; slice 0 owns it so shards run it exactly once",
)
def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
