"""functions/fastlit.py: SQL-literal injection must be bit-identical to
the per-element F.lit path it replaced (r13 optimization — q169/q168/
q140 centroid/hyperplane inlining)."""

import math

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.fastlit import (
    double_array_lit,
    double_matrix_lit,
)

EDGE_VALUES = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    0.1,
    4.5e-7,
    -3.2e17,
    1e300,
    5e-324,          # smallest subnormal
    123456789.123456789,
    math.pi,
    1.7976931348623157e308,  # max double
]


def test_double_array_lit_bit_identical(spark):
    got = (
        spark.range(1)
        .select(double_array_lit(EDGE_VALUES).alias("a"))
        .collect()[0]["a"]
    )
    ref = (
        spark.range(1)
        .select(F.array(*[F.lit(v) for v in EDGE_VALUES]).alias("a"))
        .collect()[0]["a"]
    )
    assert all(
        math.copysign(1.0, g) == math.copysign(1.0, r) and g == r
        for g, r in zip(got, ref)
    )
    assert len(got) == len(EDGE_VALUES)


def test_double_matrix_lit_matches_rows(spark):
    mat = [EDGE_VALUES[:4], EDGE_VALUES[4:8], [2.5, -2.5, 0.25, -0.125]]
    got = (
        spark.range(1)
        .select(double_matrix_lit(mat).alias("m"))
        .collect()[0]["m"]
    )
    assert [list(r) for r in got] == [[float(x) for x in row] for row in mat]


def test_non_finite_rejected():
    with pytest.raises(ValueError):
        double_array_lit([1.0, float("nan")])
    with pytest.raises(ValueError):
        double_array_lit([float("inf")])


def test_constant_folds_to_single_literal(spark):
    """The whole nested-array expression must constant-fold — the
    optimized plan carries one Literal, not a per-row CreateArray."""
    df = spark.range(1).select(
        double_matrix_lit([[1.0, 2.0], [3.0, 4.0]]).alias("m")
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # folded: the project holds a nested-array Literal, no array(...) calls
    assert "array(" not in optimized.lower()
    assert "[[1.0,2.0],[3.0,4.0]]" in optimized


def test_srp_cell_unchanged_by_fastlit(spark):
    """srp_cell's folded-literal rewrite returns the exact cells of the
    original unrolled formulation (re-expressed inline here)."""
    from nahuatl_data_pipeline_spark.operators.semantic_dedup import (
        srp_cell,
        srp_signs,
    )
    from nahuatl_data_pipeline_spark.operators.similarity import _dot

    n_bits, dim = 6, 8
    df = spark.range(40).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.cos(i * (F.col("id") + 1)),
        ).alias("v"),
    )
    v = F.transform(F.col("v"), lambda x: x.cast("double"))
    legacy = F.lit(0).cast("long")
    for j, row in enumerate(srp_signs(n_bits, dim)):
        plane = F.array(*[F.lit(s) for s in row])
        legacy = legacy + F.when(
            _dot(v, plane) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0)).cast("long")
    rows = df.select(
        srp_cell("v", n_bits, dim).alias("new"), legacy.alias("old")
    ).collect()
    assert all(r["new"] == r["old"] for r in rows)
    assert len({r["new"] for r in rows}) > 1  # non-degenerate
