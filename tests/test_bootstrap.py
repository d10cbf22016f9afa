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


def test_poisson_hex_thresholds_equal_float_cuts_at_boundaries():
    """poisson_weight_hex's string compare must agree with the float
    inverse-CDF for EVERY 32-bit draw — checked exhaustively at the
    threshold boundaries (where Fraction-exact derivation matters; a
    float multiply could round across) plus a random sample."""
    import random

    from nahuatl_data_pipeline_spark.operators.bootstrap import (
        POISSON1_CUM_HEX,
    )

    def w_float(v):
        u = v / 4294967296.0
        for i, c in enumerate(POISSON1_CUM):
            if u < c:
                return i
        return 6

    def w_hex(v):
        h8 = format(v, "08x")
        for i, t in enumerate(POISSON1_CUM_HEX):
            if h8 <= t:
                return i
        return 6

    vals = {0, 2**32 - 1}
    for t in POISSON1_CUM_HEX:
        T = int(t, 16)
        vals.update({T - 1, T, T + 1})
    rng = random.Random(7)
    vals.update(rng.randrange(2**32) for _ in range(20000))
    assert all(w_float(v) == w_hex(v) for v in vals)
