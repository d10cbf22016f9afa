"""Deterministic Poisson bootstrap: weight distribution, determinism,
and CI sanity on a known population."""

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.bootstrap import (
    POISSON1_CUM,
    bootstrap_mean_ci,
    poisson_weight,
)


def test_poisson_cum_constants_are_the_cdf():
    import math

    e = math.exp(-1.0)
    assert abs(POISSON1_CUM[0] - e) < 1e-15
    assert abs(POISSON1_CUM[1] - 2 * e) < 1e-15
    assert 0.999 < POISSON1_CUM[5] < 1.0


def test_poisson_weight_inverse_cdf_buckets(spark):
    df = spark.createDataFrame(
        [(0.0,), (0.36,), (0.37,), (0.73,), (0.74,), (0.9999,)], ["u"]
    )
    got = [
        r["w"]
        for r in df.select(
            poisson_weight(F.col("u")).alias("w")
        ).collect()
    ]
    assert got == [0, 0, 1, 1, 2, 6]


def test_bootstrap_ci_deterministic_and_brackets_mean(spark):
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    a = bootstrap_mean_ci(df, F.col("v"), "k", reps=32).collect()[0]
    b = bootstrap_mean_ci(df, F.col("v"), "k", reps=32).collect()[0]
    assert a == b  # pure function of content
    assert a["n"] == 2000 and a["mean"] == 49.5
    assert a["ci_lo"] < 49.5 < a["ci_hi"]
    # population sd ~28.9 -> se of mean ~0.65; CI must be sane-sized
    assert 0.1 < a["ci_hi"] - a["ci_lo"] < 5.0


def test_bootstrap_shuffle_carries_only_replicate_partials(spark):
    df = spark.range(5000).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    plan = (
        bootstrap_mean_ci(df, F.col("v"), "k", reps=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial aggregation before the exchange: the b-keyed shuffle
    # moves <= reps rows per task, not the exploded stream
    assert "partial" in plan.lower()
