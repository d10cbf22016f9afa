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
uniform — replicate ``b``'s draw is the 8-hex window at
``1 + 8*(b%4)`` of ``md5("{seed}:{b//4}:" || id)``, four independent
32-bit uniforms per hash call (the repo's engine-portable recipe,
packed 4-per-md5 since round 13) — so the "random" resamples are a
pure function of the data. Re-runs, repartitionings, and SQL engines
reproduce the identical CI — the same reproducibility contract as
every sampler in mixing.py, and what makes an exact cross-engine
oracle possible for a *bootstrap*. The inverse-CDF compares the raw
hex window against fixed thresholds (``POISSON1_CUM_HEX``); nothing
parses the hex.

Scale shape: explode B/4 hash groups then 4 window slots per row (a
narrow projection — no input column is duplicated B times except
through the aggregate), then one map-side-combined groupBy(b) — the
shuffle carries ≤ B rows per task. The replicate-statistic table is B
rows; everything after is constant-size.
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

# The same cuts as 8-hex-digit thresholds on the RAW hash window: for a
# 32-bit draw v, v/2^32 < c  ⟺  v ≤ floor(c·2^32) (the products are
# never integers: the cuts carry full 53-bit mantissas), and fixed-
# width lowercase hex compares lexicographically exactly like the
# number — so the inverse-CDF needs NO hex→int parse at all.
# Fraction keeps the threshold computation exact in the doubles' own
# values (float multiplication could round across the boundary).
from fractions import Fraction as _Fr

POISSON1_CUM_HEX = [
    format(int(_Fr(c) * (1 << 32)), "08x") for c in POISSON1_CUM
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


def poisson_weight_hex(h8: Column) -> Column:
    """``poisson_weight`` evaluated DIRECTLY on an 8-hex-char hash
    window (lowercase, as md5 emits): ``h8 <= POISSON1_CUM_HEX[i]`` is
    bit-for-bit the same predicate as ``u < POISSON1_CUM[i]`` on the
    parsed uniform, with six 8-byte string compares instead of a
    conv() parse per draw (conv was the top cost of the bootstrap's
    hot path once the hashes were 4-way packed — measured at sf0.1).
    Same caveat as poisson_weight: pass a materialized column."""
    expr = F.lit(6)
    for i, t in reversed(list(enumerate(POISSON1_CUM_HEX))):
        expr = F.when(h8 <= F.lit(t), F.lit(i)).otherwise(expr)
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

    Codegen/cost shape (round-13): the replicate index is exploded
    FIRST and the hash draw computed after it, instead of inlining the
    hash+CASE expression ``reps`` times into one literal struct array —
    the inlined form generated >16k lines of Java at reps=64, failed
    janino compilation (64 KB method limit), and silently dropped the
    Generate stage out of whole-stage codegen. The dominant cost is the
    md5 call itself (~75% of full-compute wall at sf0.1, measured), so
    each hash is stretched to FOUR draws: md5 yields 32 hex chars and
    replicate ``b`` reads the 8-char window ``1 + 8*(b%4)`` of
    ``md5("{seed}:{b//4}:" || id)`` — a quarter of the hash calls, each
    window an independent uniform (cryptographic bit-independence), the
    draw still a pure function of (seed, b, id) and mirrored
    slot-for-slot by the DuckDB oracle. The window and the hash each
    get their OWN projection: the inverse-CDF when-chain references its
    input 6 times and codegen does not CSE across branches (inlining
    re-ran the md5 up to 6x per draw — measured 16 s → 8 s at sf0.1).
    The inverse-CDF itself runs on the RAW hex window via
    :func:`poisson_weight_hex` (no conv() parse — conv was the top
    remaining cost); net: 7.75 s → 3.4 s full-compute at sf0.1,
    codegen-clean, draws bit-identical between engines."""
    if reps % 4:
        raise ValueError(f"reps must be a multiple of 4, got {reps}")
    x = value.cast("double")
    hash_ = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("__g").cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    h8 = F.col("__h").substr(F.lit(1) + F.col("__s") * F.lit(8), F.lit(8))
    rep_means = (
        df.select(
            x.alias("__x"),
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.lit(reps // 4 - 1))
            ).alias("__g"),
        )
        .select(F.col("__x"), F.col("__g"), hash_.alias("__h"))
        .select(
            F.col("__x"),
            F.col("__g"),
            F.col("__h"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__s"),
        )
        .select(
            F.col("__x"),
            (F.col("__g") * 4 + F.col("__s")).alias("b"),
            h8.alias("__h8"),
        )
        .select(
            F.col("__x"),
            F.col("b"),
            poisson_weight_hex(F.col("__h8")).alias("__w"),
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
