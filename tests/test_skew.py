"""Salted join/agg must produce exactly the plain-operator results while
spreading hot keys across salt sub-keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # 900 rows on one hot key + 100 spread over 10 keys
    rows = [("hot", i, float(i)) for i in range(900)] + [
        (f"k{i % 10}", i, float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, "k string, v long, x double")


def _dim(spark):
    rows = [("hot", "HOT")] + [(f"k{i}", f"K{i}") for i in range(10)]
    return spark.createDataFrame(rows, "k string, label string")


def test_salted_join_equals_plain_join(spark):
    big, dim = _skewed(spark), _dim(spark)
    plain = sorted(map(tuple, big.join(dim, "k").select("k", "v", "label").collect()))
    salted = sorted(
        map(
            tuple,
            salted_join(big, dim, "k", num_salts=4)
            .select("k", "v", "label")
            .collect(),
        )
    )
    assert salted == plain and len(plain) == 1000


def test_salted_join_left_outer(spark):
    big = _skewed(spark)
    dim = _dim(spark).filter(F.col("k") != "hot")  # hot key unmatched
    out = salted_join(big, dim, "k", num_salts=4, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("k") == "hot").filter(F.col("label").isNull()).count() == 900


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("x").alias("s"),
            F.count("v").alias("n"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["sum_x"], r["count_v"], r["min_x"], r["max_x"])
        for r in salted_agg(
            df, ["k"], {"x": "sum", "v": "count"}, num_salts=4
        )
        .join(
            salted_agg(df, ["k"], {"x": "min"}, num_salts=4), "k"
        )
        .join(salted_agg(df, ["k"], {"x": "max"}, num_salts=4), "k")
        .withColumnRenamed("min_x", "min_x")
        .collect()
    }
    for k, (s, n, mn, mx) in plain.items():
        ss, sn, smn, smx = salted[k]
        assert abs(ss - s) < 1e-6 and sn == n and smn == mn and smx == mx


def test_salted_agg_rejects_non_decomposable(spark):
    import pytest

    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(_skewed(spark), ["k"], {"x": "avg"})


def test_salted_join_rejects_small_side_preserving_joins(spark):
    import pytest

    big, dim = _skewed(spark), _dim(spark)
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="duplicate unmatched small-side"):
            salted_join(big, dim, "k", num_salts=4, how=how)


def test_salted_join_key_only_large_side(spark):
    """A large side with ONLY the join key (keep-list filtering shape)
    must not crash on zero salt columns — a random salt spreads rows and
    join output is salt-independent."""
    big = _skewed(spark).select("k")
    dim = _dim(spark)
    out = salted_join(big, dim, "k", num_salts=4, how="left_semi")
    assert out.count() == 1000


def test_q69_plan_shows_salt_stage(spark):
    """The registered q69 rollup must actually route through the salted
    two-stage plan: two aggregation levels with the __salt sub-key in
    the first grouping (VERDICT r04 'Next round' #6)."""
    import os

    import pytest

    from tests.conftest import SF_ORACLE

    if not os.path.isdir(SF_ORACLE):
        pytest.skip("driver-generated testdata absent")
    from nahuatl_data_pipeline_spark.registry import _QUERIES

    df = _QUERIES["q69_salted_event_rollup"](spark, SF_ORACLE)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in optimized
    physical = df._jdf.queryExecution().executedPlan().toString()
    # one partial+final pair per stage => 4 HashAggregate nodes total
    assert physical.count("HashAggregate") >= 4


def test_key_skew_report_hand_case(spark):
    from nahuatl_data_pipeline_spark.operators.skew import key_skew_report

    # 10 rows of 'hot', 1 each of 5 cold keys -> 15 rows, 6 keys
    rows = [("hot",)] * 10 + [(f"c{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, ["k"])
    r = key_skew_report(df, "k", n_partitions=3).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_freq"]) == (15, 6, 10)
    assert r["top1_share"] == round(10 / 15, 6)
    # hottest key = 10 rows vs avg partition of 5 -> salt 2
    assert r["salt_factor"] == 2
    assert r["hhi"] == round((100 + 5) / 225, 6)


def test_key_skew_report_uniform_needs_no_salt(spark):
    from nahuatl_data_pipeline_spark.operators.skew import key_skew_report

    df = spark.createDataFrame([(f"k{i % 8}",) for i in range(80)], ["k"])
    r = key_skew_report(df, "k", n_partitions=8).collect()[0]
    assert r["salt_factor"] == 1
    assert r["max_freq"] == 10


def test_key_skew_report_counts_null_keys(spark):
    from nahuatl_data_pipeline_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [(None,), (None,), (None,), ("a",)], "k string"
    )
    r = key_skew_report(df, "k").collect()[0]
    # NULL groups like a value: it's the hottest "key" here
    assert (r["n_keys"], r["max_freq"]) == (2, 3)
