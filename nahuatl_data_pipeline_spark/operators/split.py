"""Deterministic train/val/test splitting (SURVEY.md §2.8).

The reference seeds ``random.seed(42)``, shuffles an index list and slices
at exact cutoffs (``src/pipeline/unify.py:277-316``) — exact sizes,
disjoint, reproducible. Spark's ``randomSplit`` gives only *approximate*
sizes and depends on partition layout, so instead we rank rows by a
*stable content hash* (md5 of key + seed) and cut at exact row numbers:

    rank = row_number() OVER (ORDER BY md5(seed || ':' || key), key)
    split = CASE WHEN rank <= n*r_train THEN 'train' ...

Properties: exact counts, independent of partitioning/cluster size,
reproducible across engines (md5 is md5 everywhere — the same assignment
is computable in any SQL oracle). One global sort — at 100 TB prefer the
stratified variant, which sorts within strata (parallel windows), or a
hash-mod assignment (``hash_split``) which needs no sort at all at the
cost of approximate sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK = "__split_rank"
_N = "__split_n"


def _shuffle_hash(key_col, seed: int):
    return F.md5(F.concat_ws(":", F.lit(str(seed)), key_col.cast("string")))


def seeded_split(
    df: DataFrame,
    key: str,
    ratios: dict[str, float] | None = None,
    seed: int = 42,
    stratify_by: str | None = None,
    split_col: str = "split",
) -> DataFrame:
    """R1/R2: exact-count seeded split; optional stratification.

    ``ratios`` must sum to 1 (config.py:72-93 validates the same); default
    90/5/5. Cutoffs per stratum are ``floor(n*c1)``, ``floor(n*c2)`` on the
    cumulative ratios — identical to the reference's ``int(n*0.9)`` slicing.
    """
    ratios = ratios or {"train": 0.9, "validation": 0.05, "test": 0.05}
    if abs(sum(ratios.values()) - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1, got {ratios}")
    names = list(ratios)
    cum = []
    acc = 0.0
    for name in names[:-1]:
        acc += ratios[name]
        cum.append((name, acc))

    order = [_shuffle_hash(F.col(key), seed), F.col(key)]
    if stratify_by:
        w = Window.partitionBy(stratify_by).orderBy(*order)
        wn = Window.partitionBy(stratify_by)
    else:
        w = Window.orderBy(*order)
        wn = Window.partitionBy()
    out = df.withColumn(_RANK, F.row_number().over(w)).withColumn(
        _N, F.count(F.lit(1)).over(wn)
    )
    # CASE built outside-in: the earliest (smallest) cutoff must win, so it
    # is applied last and ends up as the outermost WHEN.
    expr = F.lit(names[-1])
    for name, c in reversed(cum):
        expr = F.when(
            F.col(_RANK) <= F.floor(F.col(_N) * F.lit(c)), F.lit(name)
        ).otherwise(expr)
    return out.withColumn(split_col, expr).drop(_RANK, _N)


def hash_split(
    df: DataFrame,
    key: str,
    ratios: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Scale-path split: assignment by content-hash bucket — no sort, no
    shuffle, approximate sizes (law of large numbers makes it exact enough
    at 100 TB). Same md5 hash family as ``seeded_split``."""
    ratios = ratios or {"train": 0.9, "validation": 0.05, "test": 0.05}
    names = list(ratios)
    # bucket in [0,1): first 8 hex chars of md5 / 16^8
    bucket = (
        F.conv(F.substring(_shuffle_hash(F.col(key), seed), 1, 8), 16, 10).cast(
            "double"
        )
        / F.lit(float(16**8))
    )
    expr = F.lit(names[-1])
    acc = 0.0
    cuts = []
    for name in names[:-1]:
        acc += ratios[name]
        cuts.append((name, acc))
    for name, c in reversed(cuts):
        expr = F.when(bucket < F.lit(c), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def split_leakage_count(
    a: DataFrame, b: DataFrame, key_cols: list[str]
) -> int:
    """R3/J6: # of keys shared between two splits (must be 0).

    left_semi join — no driver-side set materialization
    (test_parity_with_legacy.py:309-345 did set intersection in memory).
    """
    return a.select(key_cols).join(b.select(key_cols), key_cols, "left_semi").count()
