"""Skew-mitigation utilities for hot-key joins and aggregations.

At 100 TB a handful of hot keys (empty strings, 'unknown' sources, viral
user_ids) can put one shuffle partition hours behind the rest. Two layers
of defense:

1. AQE skew-join splitting is ON in the session factory
   (``spark.sql.adaptive.skewJoin.enabled`` — runtime re-plan, zero code);
2. ``salted_join`` / ``salted_agg`` below for the cases AQE can't fix —
   e.g. a shuffled hash aggregate on a hot group key, or a join where the
   build side is too big to broadcast but small enough to replicate
   num_salts times.

Salting is deterministic (hash of the row's other columns, not rand()):
results are reproducible at any partition count, same as every other
operator in this engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``large`` has skewed join keys and ``small`` is too
    big to broadcast: salt the large side into ``num_salts`` sub-keys
    (deterministic hash of its other columns) and replicate the small side
    once per salt — the hot key's rows spread over num_salts reducers.

    Cost model: small side shuffles num_salts× its size; worth it when
    the hot key's partition would otherwise dominate the stage.

    Only join types that preserve the large side are allowed: a right or
    full join would emit each unmatched small-side row num_salts times
    (it exists once per salt replica).
    """
    allowed_how = {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed_how:
        raise ValueError(
            f"salted_join supports {sorted(allowed_how)}; {how!r} would "
            "duplicate unmatched small-side rows once per salt"
        )
    salt_cols = salt_by or [c for c in large.columns if c != on]
    if salt_cols:
        salt: Column = F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(num_salts)
        )
    else:
        # key-only frame: nothing content-based to spread on — a random
        # salt is still CORRECT (salt choice never changes join output,
        # only row placement) and spreads the hot key uniformly
        salt = F.floor(F.rand(seed=42) * num_salts).cast("long")
    l = large.withColumn(_SALT, salt.cast("int"))
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return l.join(s, [on, _SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    num_salts: int = 8,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: aggregate on
    (key, salt) first — hot keys spread over num_salts reducers — then
    combine the partials. Supports decomposable aggs: sum, count, min,
    max (avg = sum/count at the call site).

    Spark's hash aggregate already does map-side partial aggregation; this
    helps when the DISTINCT value count per hot key is large enough that
    partials still funnel into one reducer.
    """
    allowed = {"sum", "count", "min", "max"}
    bad = {v for v in aggs.values()} - allowed
    if bad:
        raise ValueError(f"non-decomposable agg(s): {sorted(bad)}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    stage1 = df.withColumn(_SALT, salt).groupBy(*group_cols, _SALT).agg(
        *[
            getattr(F, fn)(col).alias(f"__p_{col}")
            for col, fn in aggs.items()
        ]
    )
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return stage1.groupBy(*group_cols).agg(
        *[
            recombine[fn](f"__p_{col}").alias(f"{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 200,
    round_to: int = 6,
) -> DataFrame:
    """One-row join-key skew diagnostic — the "will this key shuffle
    skew at scale" check run BEFORE a production join, answering which
    remedy the key needs: nothing, AQE skew splitting, or
    ``salted_join``.

    Columns: ``n_rows, n_keys, max_freq`` (hottest key), ``p99_freq``
    (exact 99th percentile of per-key frequency — far from ``max_freq``
    means a handful of pathological keys, not broad skew), ``hhi``
    (Σ share² concentration, 1/n_keys = uniform), ``top1_share``, and
    ``salt_factor`` = how many times the hottest key outweighs an
    average ``n_partitions``-way partition (exact integer ceil; 1 = no
    salting needed, k > 1 = salt the hot side k ways — the
    ``salted_join`` parameter, derived instead of guessed).

    Plan: ONE map-side-combined count per key, then a single aggregate
    over the key-cardinality-sized count table. NULL keys group like
    any other value (NULL is a legal — and often the hottest — join
    key pathology).
    """
    c = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__c"))
    tot = F.sum("__c")
    mx = F.max("__c")
    agg = c.agg(
        tot.cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        mx.cast("long").alias("max_freq"),
        F.round(F.percentile(F.col("__c"), 0.99), round_to).alias(
            "p99_freq"
        ),
        F.round(
            F.sum(F.col("__c").cast("double") * F.col("__c"))
            / (tot.cast("double") * tot),
            round_to,
        ).alias("hhi"),
    )
    return agg.select(
        "n_rows",
        "n_keys",
        "max_freq",
        "p99_freq",
        "hhi",
        F.round(F.col("max_freq") / F.col("n_rows"), round_to).alias(
            "top1_share"
        ),
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(
                (
                    F.col("max_freq") * n_partitions
                    + F.col("n_rows")
                    - 1
                )
                / F.col("n_rows")
            ).cast("long"),
        ).alias("salt_factor"),
    )
