"""Exact deduplication (SURVEY.md §2.4 D1-D4, D6-D7).

The reference's dedup semantics depend on input order (pandas
``drop_duplicates(keep='last')`` after a layer sort,
``scripts/unify_datasets.py:161-178``) — order is meaningless in a
distributed engine, so every keep-policy is re-expressed as an explicit
total ordering inside one window: ``row_number() OVER (PARTITION BY key
ORDER BY <policy>) == 1``. One shuffle on the dedup key, deterministic
at any partition count, AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.normalize import dedup_key
from nahuatl_data_pipeline_spark.schemas import LAYER_PRIORITY

_KEY = "__dedup_key"
_RN = "__dedup_rn"


def layer_priority_col(layer_col: str = "layer") -> Column:
    """layer name → integer priority (enums.py:36-60): bronze 0 … gold 3."""
    expr = F.lit(-1)
    for name, rank in LAYER_PRIORITY.items():
        expr = F.when(F.col(layer_col) == name, F.lit(rank)).otherwise(expr)
    return expr


def completeness_col(lang_cols: tuple[str, ...] = ("es", "nah", "myn")) -> Column:
    """# of non-null language fields (deduplicators.py best-policy input)."""
    out = F.lit(0)
    for c in lang_cols:
        out = out + F.col(c).isNotNull().cast("int")
    return out


def total_length_col(lang_cols: tuple[str, ...] = ("es", "nah", "myn")) -> Column:
    """Σ text lengths, NULL→0 (deduplicators.py best-policy tiebreak)."""
    out = F.lit(0)
    for c in lang_cols:
        out = out + F.coalesce(F.length(F.col(c)), F.lit(0))
    return out


def exact_dedup(
    df: DataFrame,
    keys: list[str | Column],
    order_by: list[Column] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Generic window dedup: keep rank-1 row per key under ``order_by``.

    ``order_by=None`` degenerates to Spark's native ``dropDuplicates``
    (D4, SparkDedup.scala:41-49) — fine when the caller doesn't care which
    duplicate survives. Otherwise append ``tiebreak`` columns to make the
    ordering total (determinism at any parallelism).
    """
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    if order_by is None:
        return df.dropDuplicates([k for k in keys if isinstance(k, str)])
    ordering = list(order_by) + [F.col(t) for t in (tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def deduplicate(
    df: DataFrame,
    keep: str = "best",
    lang_cols: tuple[str, ...] = ("es", "nah", "myn"),
    layer_col: str = "layer",
) -> DataFrame:
    """Corpus dedup with the reference's keep policies
    (deduplicators.py:51-138).

    key = lower(trim(es))|lower(trim(nah))|lower(trim(myn)).
    - ``best``: max (layer_priority, completeness, total length) — D3;
    - ``last``: highest layer priority wins (Diamond over Silver) — D2,
      matching sort-by-layer + keep-last;
    - ``first``: lowest layer priority wins;
    - ``longest-target``: D6 polish_dataset_phd.py:50-56 — longest last
      lang col wins per pivot key.
    """
    key = dedup_key(*lang_cols).alias(_KEY)
    prio = layer_priority_col(layer_col)
    if keep == "best":
        order = [
            prio.desc(),
            completeness_col(lang_cols).desc(),
            total_length_col(lang_cols).desc(),
        ]
    elif keep == "last":
        order = [prio.desc()]
    elif keep == "first":
        order = [prio.asc()]
    elif keep == "longest-target":
        src, tgt = lang_cols[0], lang_cols[-1]
        return exact_dedup(
            df,
            [F.lower(F.trim(F.col(src)))],
            order_by=[F.coalesce(F.length(F.col(tgt)), F.lit(0)).desc()],
            tiebreak=list(lang_cols),
        )
    else:
        raise ValueError(f"unknown keep policy {keep!r}")
    # tiebreak on every column keeps the ordering total — identical text
    # with different provenance must still dedup deterministically at any
    # partition count
    return exact_dedup(df, [key], order_by=order, tiebreak=list(df.columns))


def duplicate_stats(
    df: DataFrame, keys: list[str | Column]
) -> DataFrame:
    """D3 get_duplicate_stats (deduplicators.py:237-281): total rows,
    distinct keys, duplicate rows, duplicate rate, max group size —
    one shuffle, one row out."""
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    groups = df.groupBy(*[k.alias(f"k{i}") for i, k in enumerate(key_cols)]).agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.agg(
        F.sum("n").cast("long").alias("total_records"),
        F.count(F.lit(1)).cast("long").alias("unique_keys"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("duplicate_records"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))) / F.sum("n"), 6
        ).alias("duplicate_rate"),
        F.max("n").cast("long").alias("max_group_size"),
    )


def union_layers(*dfs: DataFrame) -> DataFrame:
    """D1: schema-aligned union of layer DataFrames (unify.py:123-143)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def cross_source_dup_matrix(
    df: DataFrame, source_col: str, keys: list[str | Column]
) -> DataFrame:
    """Where is the duplication coming from: exact-dup PAIR counts per
    (source_a ≤ source_b) — same-source pairs are within-crawl
    repetition, cross-source pairs are mirror/aggregator overlap, and
    the split decides which ingestion feed to cap or drop.

    Plan: one (key, source) count aggregate over the corpus (the only
    full-data shuffle), then a key-equi self-join of the COUNT table —
    its size is |distinct keys × sources present|, and per-key work is
    |sources|², never group-size². Pair math per (key, src_a, src_b):
    same source → c·(c−1)/2, different → c_a·c_b; summed into a
    |sources|² matrix.
    """
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    counts = df.groupBy(
        *[k.alias(f"k{i}") for i, k in enumerate(key_cols)],
        F.col(source_col).alias("__src"),
    ).agg(F.count(F.lit(1)).alias("c"))
    knames = [f"k{i}" for i in range(len(key_cols))]
    a = counts.select(
        *knames, F.col("__src").alias("source_a"), F.col("c").alias("ca")
    )
    b = counts.select(
        *knames, F.col("__src").alias("source_b"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, knames)
        .filter(F.col("source_a") <= F.col("source_b"))
        .withColumn(
            "n_pairs",
            F.when(
                F.col("source_a") == F.col("source_b"),
                (F.col("ca") * (F.col("ca") - 1) / 2).cast("long"),
            ).otherwise((F.col("ca") * F.col("cb")).cast("long")),
        )
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.sum("n_pairs").cast("long").alias("n_dup_pairs"))
        .filter(F.col("n_dup_pairs") > 0)
    )
