"""Deterministic Poisson bootstrap — distribution-free confidence
intervals for corpus-scale metrics in ONE aggregate pass.

The classical bootstrap resamples n rows WITH replacement B times —
impossible to do literally on a distributed table (each resample is a
global random multiset). The standard large-scale reformulation: each
row's multiplicity in replicate b is Poisson(1)-distributed, which is
exactly what sampling n of n with replacement converges to, and which
needs NO coordination — every row computes its own B weights locally.

This implementation goes one step further than the textbook version:
the Poisson draw is DETERMINISTIC, inverted from a content-hash
uniform (``md5("{seed}:{b}:" || id)`` — the repo's engine-portable
recipe), so the "random" resamples are a pure function of the data.
Re-runs, repartitionings, and SQL engines reproduce the identical CI —
the same reproducibility contract as every sampler in mixing.py, and
what makes an exact cross-engine oracle possible for a *bootstrap*.

Scale shape: explode B weight structs per row (a narrow projection —
no input column is duplicated B times except through the aggregate),
then one map-side-combined groupBy(b) — the shuffle carries ≤ B rows
per task. The replicate-statistic table is B rows; everything after
is constant-size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cumulative Poisson(1) CDF at 0..5; a uniform above the last cut maps
# to multiplicity 6 (P ≈ 6e-5). Computed once so the Python floats that
# feed Spark literals and SQL text are the same objects.
_E = math.exp(-1.0)
POISSON1_CUM = [
    _E * sum(1.0 / math.factorial(j) for j in range(i + 1)) for i in range(6)
]


def poisson_weight(u: Column) -> Column:
    """Poisson(1) multiplicity from a uniform in [0,1) by inverse-CDF
    table lookup — six branch constants, exact IEEE comparisons, no
    transcendental calls at runtime. ``u`` is referenced once per
    branch (6×) and codegen does not CSE across when-branches: pass a
    materialized column, not an expensive inline expression."""
    expr = F.lit(6)
    for i, c in reversed(list(enumerate(POISSON1_CUM))):
        expr = F.when(u < F.lit(c), F.lit(i)).otherwise(expr)
    return expr


def bootstrap_mean_ci(
    df: DataFrame,
    value: Column,
    id_col: str,
    reps: int = 64,
    seed: int = 11,
    alpha: float = 0.05,
    round_to: int = 4,
) -> DataFrame:
    """1-row DataFrame: ``n``, ``mean``, ``se``, ``ci_lo``, ``ci_hi`` —
    the mean of ``value`` with a percentile-bootstrap (1−alpha) CI from
    ``reps`` deterministic Poisson resamples.

    Each input row explodes to ``reps`` (b, w) pairs (w = Poisson(1)
    multiplicity hashed from ``id_col``); replicate means are
    Σw·x / Σw per b via one map-side-combined aggregate; the CI is an
    exact-percentile aggregate over the ``reps``-row replicate table
    (PERCENTILE_CONT semantics, q101 parity). ``mean``/``n`` come from
    a separate plain aggregate of the input — the cheap audit leg.
    Doubles are rounded to ``round_to`` only on emission; summation-
    order ulps sit far below that at any realistic magnitude.

    Codegen shape (round-13 fix): the replicate index is exploded from
    ``sequence(0, reps-1)`` FIRST and the md5→inverse-CDF weight is
    computed once AFTER the explode, instead of inlining the hash+CASE
    expression ``reps`` times into one literal struct array — the
    inlined form generated >16k lines of Java at reps=64, failed janino
    compilation (64 KB method limit), and silently dropped the Generate
    stage out of whole-stage codegen. Output-identical: the post-
    explode weight is the same ``md5("{seed}:{b}:" || id)`` draw for
    the same (b, id); only where the expression sits relative to the
    explode moves."""
    x = value.cast("double")
    b = F.col("__b")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:"),
                        b.cast("string"),
                        F.lit(":"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    rep_means = (
        df.select(
            x.alias("__x"),
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("__b"),
        )
        # u gets its OWN projection before the inverse-CDF: the when-
        # chain references its input 6 times and codegen does not
        # common-subexpression-eliminate across the branches — inlining
        # u re-ran the md5 up to 6x per draw (measured 16 s -> 8 s at
        # sf0.1 full-compute)
        .select(F.col("__x"), b.alias("b"), u.alias("__u"))
        .select(
            F.col("__x"),
            F.col("b"),
            poisson_weight(F.col("__u")).alias("__w"),
        )
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("__w") * F.col("__x"))
                / F.sum("__w").cast("double")
            ).alias("m")
        )
    )
    stats = rep_means.agg(
        F.round(F.percentile("m", alpha / 2), round_to).alias("ci_lo"),
        F.round(F.percentile("m", 1 - alpha / 2), round_to).alias("ci_hi"),
        F.round(F.stddev_samp("m"), round_to).alias("se"),
    )
    base = df.agg(
        F.count(x).alias("n"),
        F.round(F.avg(x), round_to).alias("mean"),
    )
    return base.crossJoin(F.broadcast(stats)).select(
        "n", "mean", "se", "ci_lo", "ci_hi"
    )
