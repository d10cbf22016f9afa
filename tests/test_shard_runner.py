"""tools/run_tests_sharded.py unit tests (pure Python — no Spark).

The runner's correctness property: its work units cover every test file
exactly once, with test_oracle_parity.py expanded into slices that
partition the parametrized query set exactly (no test lost, none run
twice). The subprocess/threading machinery is exercised by using the
runner itself; these tests pin the partitioning logic it relies on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from run_tests_sharded import PARITY, TESTS, build_units


def test_units_cover_every_test_file_exactly_once():
    k = 8
    units = build_units(k)
    files = sorted(
        f for f in os.listdir(TESTS)
        if f.startswith("test_") and f.endswith(".py")
    )
    unit_files = [os.path.basename(p) for p, _ in units]
    assert unit_files.count(PARITY) == k
    non_parity = [f for f in unit_files if f != PARITY]
    assert sorted(non_parity) == sorted(f for f in files if f != PARITY)


def test_parity_slices_partition_exactly():
    # Mirror of test_oracle_parity._slice_of: round-robin by sorted index.
    from nahuatl_data_pipeline_spark import registry

    names = sorted(registry.oracle_sql())
    k = 8
    slices = [[n for j, n in enumerate(names) if j % k == i] for i in range(k)]
    flat = sorted(n for s in slices for n in s)
    assert flat == names  # exact partition: nothing lost, nothing doubled
    assert max(len(s) for s in slices) - min(len(s) for s in slices) <= 1


def test_slice_env_is_honored_by_parity_module():
    env = os.environ.get("SPARK_GRAFT_TEST_SLICE")
    try:
        os.environ["SPARK_GRAFT_TEST_SLICE"] = "1/5"
        import importlib

        import tests.test_oracle_parity as top

        mod = importlib.reload(top)
        from nahuatl_data_pipeline_spark import registry

        names = sorted(registry.oracle_sql())
        assert mod.WITH_ORACLE == [n for j, n in enumerate(names) if j % 5 == 1]
    finally:
        if env is None:
            os.environ.pop("SPARK_GRAFT_TEST_SLICE", None)
        else:
            os.environ["SPARK_GRAFT_TEST_SLICE"] = env
        import importlib

        import tests.test_oracle_parity as top

        importlib.reload(top)
