"""Every registered query with an oracle must hash-match DuckDB at sf0.01
(same protocol as the driver's correctness gate) and run at sf0.001.

Queries without an oracle get a rows-run smoke check.

SPARK_GRAFT_TEST_SLICE="i/k" restricts the parametrization to every
k-th query (round-robin by sorted index) so tools/run_tests_sharded.py
can spread this file — by far the suite's longest — across concurrent
pytest processes. The k slices partition the full set exactly; unset
means everything (the default for a plain `pytest tests/` run, and what
CI-of-record should use).

The Spark side of every (selected) query is precomputed CONCURRENTLY by
a session-scoped fixture — guide §2.6: a single local[N] SparkSession
happily runs several independent jobs at once, and one tiny sf0.01
query leaves most of the machine idle, so overlapping them cuts this
file's wall clock ~3× with the SAME queries, SAME assertions, SAME
parametrization (each test still owns exactly its query's comparison;
a query that raised re-raises in its own test). SPARK_GRAFT_TEST_THREADS
sets the overlap (default cpus//4 capped at 8; 1 = the old strictly
sequential execution). Query paths were audited for session-shared
state: the one SQL-parse site binds its input frame by parameter (no
temp view), cache registries are lock-guarded, and every remaining race
costs at most a deterministic recompute, never a different result.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from nahuatl_data_pipeline_spark import registry
from tests.conftest import SF_ORACLE, SF_SMOKE, assert_frames_match

_SLICE = os.environ.get("SPARK_GRAFT_TEST_SLICE")


def _n_threads() -> int:
    env = os.environ.get("SPARK_GRAFT_TEST_THREADS")
    if env:
        return max(1, int(env))
    return min(8, max(2, (os.cpu_count() or 8) // 4))


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


def _run_parity(spark, name: str):
    """Spark side of one oracle-parity case (exactly what the test body
    used to run inline)."""
    return registry.queries()[name](spark, SF_ORACLE).toPandas()


def _run_smoke(spark, name: str):
    df = registry.queries()[name](spark, SF_SMOKE)
    return (df.count(), len(df.schema.fields))


def _precompute(spark, names: list[str], runner) -> dict[str, object]:
    """Run ``runner(spark, name)`` for every name on a small thread pool
    (guide §2.6 job overlap). Each entry is the result or the raised
    exception — the owning parametrized test re-raises it, so failure
    attribution is unchanged from sequential execution."""

    def one(name: str):
        sc = spark.sparkContext
        sc.setJobDescription(f"parity:{name}")  # thread-local label
        try:
            return runner(spark, name)
        except Exception as exc:  # noqa: BLE001 — re-raised in the test
            return exc
        finally:
            sc.setJobDescription(None)

    with ThreadPoolExecutor(max_workers=_n_threads()) as pool:
        return dict(zip(names, pool.map(one, names)))


@pytest.fixture(scope="session")
def parity_results(spark) -> dict[str, object] | None:
    if _n_threads() <= 1:
        return None  # strictly sequential legacy mode
    return _precompute(spark, WITH_ORACLE, _run_parity)


@pytest.fixture(scope="session")
def smoke_results(spark) -> dict[str, object] | None:
    if _n_threads() <= 1:
        return None
    return _precompute(spark, NO_ORACLE, _run_smoke)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, parity_results, name):
    if parity_results is None:
        spark_pdf = _run_parity(spark, name)
    else:
        # pop: each test owns exactly one precomputed entry; freeing it
        # here keeps peak memory at one result set per in-flight thread
        # plus the not-yet-consumed tail, never the whole suite twice.
        spark_pdf = parity_results.pop(name)
        if isinstance(spark_pdf, Exception):
            raise spark_pdf
    con = duck(SF_ORACLE)
    oracle_pdf = con.sql(registry.oracle_sql()[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, smoke_results, name):
    if smoke_results is None:
        n_rows, n_fields = _run_smoke(spark, name)
    else:
        res = smoke_results.pop(name)
        if isinstance(res, Exception):
            raise res
        n_rows, n_fields = res
    assert n_rows >= 0
    assert n_fields > 0


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
