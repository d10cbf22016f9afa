"""Deterministic corpus mixing / stratified downsampling — the
data-mixture step of a training pipeline (e.g. "keep 100% of curated,
30% of crawl, 5% of synthetic"), kept REPRODUCIBLE and engine-portable.

``df.sample(fraction, seed)`` is partition-dependent (same seed, new
layout → different rows), which silently changes a training set between
runs. Instead, membership is a pure function of content: a row is kept
iff ``md5(seed:key)``'s first 8 hex digits, read as a fraction of
16^8, fall below the stratum's rate — the same decision any engine can
recompute (the md5-rank family used by ``seeded_split``,
``src/pipeline/unify.py:277-316``).

Zero shuffle: sampling is a narrow filter; at 100 TB it composes with
scan pushdown (the md5 can't push down, but partition/column pruning
still applies and no exchange is introduced).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(16**8)


def sample_bucket(key: Column, seed: int) -> Column:
    """Uniform [0,1) bucket from content: first 8 md5 hex chars / 16^8.

    ``concat`` (not ``concat_ws``) on purpose: a NULL key must yield a
    NULL bucket so null-key rows are DROPPED by the `< rate` filter —
    matching SQL semantics (`NULL < rate` is not true). concat_ws would
    skip the null and hash every null-key row to one constant bucket,
    keeping or dropping them all together depending on the rate."""
    h = F.md5(F.concat(F.lit(str(seed) + ":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_DENOM)


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~fraction of rows, decided per-row by content hash —
    reproducible across runs, partitionings, and engines."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(sample_bucket(F.col(key), seed) < F.lit(fraction))


def stratified_mix(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key: str,
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (the training-mix recipe): stratum s
    keeps ``rates[s]`` of its rows; strata absent from ``rates`` keep
    ``default_rate``. One narrow filter, no shuffle."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    rate: Column = F.lit(float(default_rate))
    for s, r in rates.items():
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(sample_bucket(F.col(key), seed) < rate)
