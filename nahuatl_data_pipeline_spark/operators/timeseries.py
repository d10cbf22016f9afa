"""Time-series downsampling (OHLC bars) and categorical transition
counts — the batch analytics a metrics/trading-style event table needs
on top of the window/rollup family.

Reference anchor: the reference's stats layer resamples per-day counts
driver-side in pandas (benchmark/generate_stats.py); here downsampling
is a single map-side-combined aggregate keyed by (series, bucket) — at
100 TB that is one shuffle whose width is the OUTPUT bar count, not the
input row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ohlc_downsample(
    df: DataFrame,
    ts: str,
    value: str,
    by: list[str],
    width: str = "1 hour",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Downsample a point series to open/high/low/close/volume bars of
    ``width`` per ``by`` key.

    open/close are ``min_by``/``max_by`` over a (ts, *tiebreak) struct —
    ONE hash aggregate with map-side partial combine (each mapper folds
    its rows to at most one candidate per bar before the shuffle), never
    a row_number window that would sort whole partitions. ``tiebreak``
    makes equal-timestamp rows deterministic (pass a unique id column);
    struct ordering is lexicographic, identical to a multi-column SQL
    ORDER BY.

    Bars are epoch-aligned tumbling windows (``F.window``); ``bar_ts``
    is the bar's inclusive start.
    """
    order: Column = F.struct(F.col(ts), *[F.col(c) for c in tiebreak or []])
    return (
        df.groupBy(*by, F.window(ts, width).start.alias("bar_ts"))
        .agg(
            F.min_by(value, order).alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max_by(value, order).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
    )


def transition_counts(
    df: DataFrame,
    by: str,
    state: str,
    order_by: list[str],
) -> DataFrame:
    """Markov transition counts: for each ``by`` entity's event sequence
    (ordered by ``order_by``, which must be a deterministic total order
    — include a unique id as tiebreak), count (previous state → state)
    pairs across the whole table.

    Plan: one window shuffle keyed by ``by`` for the LAG, then a
    (prev, next)-keyed aggregate whose width is |states|² — at 100 TB
    the second shuffle carries partial counts only. First event per
    entity has no predecessor and is excluded.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("prev_state", F.lag(state).over(w))
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", F.col(state).alias("next_state"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def ewma_last(
    df,
    keys: list[str],
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    alpha: float = 0.2,
    round_to: int = 6,
):
    """Final exponentially-weighted moving average per group:
    ``s ← α·x + (1-α)·s`` folded over the group's rows in
    ``(ts, tiebreak)`` order, seeded with the first value — the
    standard smoothed-level summary (monitoring baselines, trend
    denoising) whose recurrence no built-in aggregate expresses.

    This is the repo's tier-(b) custom-operator shape (SURVEY §custom):
    a per-group sequential fold via Arrow-batched ``applyInPandas`` —
    one shuffle on ``keys``, then each group folds independently. Scale
    contract: parallelism = group count, state = one scalar per group;
    per-ENTITY series (user, source — millions of parallel groups) are
    the intended regime, while few-group demos (5 event types) pin
    semantics but serialize per group — same trade documented at q76.
    The closed-form "windowable" rewrite s_t = Σ α(1-α)^(t-i)·x_i is
    deliberately NOT used: (1-α)^(-i) overflows doubles after ~700
    rows, so the fold is the numerically honest formulation.

    ``order_tiebreak`` must complete a TOTAL order within each group —
    float identity across engines (and runs) requires folding in one
    canonical sequence. Returned ``n`` counts the FOLDED (non-null)
    values. Oracle-parity caveats for authors: the fold uses
    ``β = 1.0 - alpha`` computed in doubles — an SQL oracle writing β
    as a decimal literal matches only when that literal IS the double
    ``1.0 - alpha`` (true for α=0.2 → 0.8, NOT true for e.g. α=0.07 →
    0.93), so either verify the identity or spell the oracle's β as
    ``1.0 - α``. Final rounding happens JVM-side (``F.round`` = SQL
    HALF_UP; Python's ``round`` is banker's and would diverge at .5
    boundaries).
    """
    import pandas as pd

    from pyspark.sql import functions as F

    beta = 1.0 - alpha
    out_fields = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    schema = f"{out_fields}, ewma double, n bigint"

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts_col, order_tiebreak])
        # NULL values are SKIPPED like SQL aggregates skip them — an
        # astype(float) NaN would otherwise poison every later step of
        # the fold; an oracle must filter value IS NOT NULL to match.
        s = None
        n = 0
        for x in pdf[value_col]:
            if pd.isna(x):
                continue
            x = float(x)
            s = x if s is None else alpha * x + beta * s
            n += 1
        row = {k: pdf[k].iloc[0] for k in keys}
        row["ewma"] = s
        row["n"] = n
        return pd.DataFrame([row])

    out = df.groupBy(*keys).applyInPandas(fold, schema=schema)
    return out.withColumn("ewma", F.round(F.col("ewma"), round_to))


def path_ngrams(
    df: DataFrame,
    by: str,
    state: str,
    order_by: list[str],
    n: int = 3,
) -> DataFrame:
    """Frequent event paths: count every length-``n`` run of states in
    each ``by`` entity's ordered sequence — :func:`transition_counts`'
    (n=2) generalization, the "what journeys do users actually take?"
    mining primitive. Output columns ``s1..sn`` + ``n_paths``.

    Plan identical in shape to the bigram case: ONE window shuffle
    keyed by ``by`` supplies the n−1 LAGs (Catalyst evaluates all lags
    in a single sort pass), then a path-keyed aggregate whose width is
    ≤ |states|ⁿ — at 100 TB the second shuffle carries partial counts
    only. Rows whose window precedes the sequence start (any lag NULL)
    are excluded, and a NULL ``state`` VALUE is treated the same way at
    every position: a row whose current state is NULL emits no path
    (symmetric with the same NULL later appearing as a lag — without
    this, a nullable state column would both emit NULL-``sn`` paths AND
    act as a sequence boundary). ``order_by`` must be a deterministic
    total order (include a unique id as tiebreak)."""
    from pyspark.sql import Window

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = Window.partitionBy(by).orderBy(*[F.col(c) for c in order_by])
    cols = [
        F.lag(state, n - 1 - i).over(w).alias(f"s{i + 1}") for i in range(n - 1)
    ] + [F.col(state).alias(f"s{n}")]
    out = df.select(*cols)
    cond = F.col("s1").isNotNull()
    for i in range(2, n + 1):
        cond = cond & F.col(f"s{i}").isNotNull()
    return (
        out.filter(cond)
        .groupBy(*[f"s{i + 1}" for i in range(n)])
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )


def gap_stats(
    df: DataFrame,
    by: str,
    ts_col: str,
    order_by: list[str],
    group_col: str,
) -> DataFrame:
    """Inter-arrival time profile: per ``by`` entity, the gap (µs)
    between consecutive events (ordered by ``order_by``), aggregated
    per ``group_col`` of the LATER event — "how long before a user
    does X again?", the recency/hazard signal behind session tuning
    and retention features.

    Gaps are EXACT integer microseconds (``unix_micros``; its SQL
    mirror ``EPOCH_US`` is the same integer), so every downstream
    statistic is arithmetic on identical integers cross-engine:
    interpolated percentiles need no rounding at all (q101 parity),
    and the mean divides an exact integer sum. One window shuffle for
    the LAG + one bounded-group aggregate."""
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(*[F.col(c) for c in order_by])
    gap = F.unix_micros(F.col(ts_col)) - F.lag(
        F.unix_micros(F.col(ts_col))
    ).over(w)
    return (
        df.withColumn("__gap", gap)
        .filter(F.col("__gap").isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.percentile("__gap", 0.5).alias("p50_us"),
            F.percentile("__gap", 0.9).alias("p90_us"),
            (
                F.sum("__gap").cast("double") / F.count(F.lit(1))
            ).alias("mean_us"),
        )
    )


def sessionize_batch(
    df: DataFrame,
    by: str,
    ts_col: str,
    order_by: list[str],
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch session assignment: within each ``by`` entity's ordered
    event stream, a gap > ``gap_seconds`` starts a new session;
    ``session_idx`` (0-based per entity) is the running count of
    session starts — the batch twin of the streaming
    ``applyInPandasWithState`` sessionizer (q46), for backfills and
    reprocessing where the watermark machinery buys nothing.

    One entity-keyed window shuffle evaluates BOTH the LAG gap test
    and the running cumsum (same sort); gaps compare in exact integer
    microseconds, so session boundaries are bit-identical cross-engine
    and under any partitioning. First event of an entity starts
    session 0."""
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(*[F.col(c) for c in order_by])
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    micros = F.unix_micros(F.col(ts_col))
    gap = micros - F.lag(micros).over(w)
    is_start = F.when(
        gap.isNull() | (gap > F.lit(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    return df.withColumn(
        "session_idx",
        (F.sum(is_start).over(w_run) - F.lit(1)).cast("long"),
    )
