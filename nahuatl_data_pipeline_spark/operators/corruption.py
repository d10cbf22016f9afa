"""Denoising training-example generation: deterministic span corruption.

The T5/UL2 objective family trains on (corrupted input, span target)
pairs manufactured from plain text: a contiguous token span is replaced
by a sentinel in the input, and the target is the sentinel followed by
the removed span. Production pipelines generate these pairs at corpus
scale as a PURE TRANSFORM — the pair set must be reproducible across
runs and engines (a re-run that corrupts different spans silently
changes the training distribution), so span selection here derives from
the content hash, not a random number generator, using the engine-wide
md5 idiom (functions/hashing.py:hash64).

No counterpart in the reference (its synthetic-data scripts call an
external LLM, re-expressed as q51); this is the self-supervised member
of that family, and it is exactly SQL-expressible — every step is
tokenize / integer arithmetic / array slicing in whole-stage codegen,
zero shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENTINEL = "<extra_id_0>"


def span_corrupt(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_span: int = 5,
    span_frac: float = 0.2,
    seed: int = 42,
    sentinel: str = SENTINEL,
) -> DataFrame:
    """One (input_text, target_text) denoising pair per document with
    ≥ 2 whitespace tokens: a span of ``min(max_span, max(1,
    floor(n·span_frac)))`` tokens starting at ``hash(seed:id) mod
    (n − span_len + 1)`` is replaced by ``sentinel`` in the input; the
    target is ``sentinel`` + the removed span. Deterministic: the same
    corpus always yields the same pairs, on any engine and any
    partitioning (content-hash start, no RNG).

    Output: ``(id, input_text, target_text, span_start, span_len)``
    with ``span_start`` 0-based in tokens. Token-joined with single
    spaces (the token-level contract shared with
    ``token_window_chunks``). Zero shuffle — the whole operator is one
    codegen projection over the scan.
    """
    from nahuatl_data_pipeline_spark.functions.hashing import hash64
    from nahuatl_data_pipeline_spark.functions.text_analysis import tokens

    if max_span < 1:
        raise ValueError(f"max_span must be >= 1, got {max_span}")
    if not 0.0 < span_frac <= 1.0:
        raise ValueError(f"span_frac must be in (0,1], got {span_frac}")
    base = (
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .withColumn("__n", F.size("__tk"))
        .where(F.col("__n") >= 2)
    )
    span_len = F.greatest(
        F.lit(1),
        F.least(
            F.lit(max_span),
            F.floor(F.col("__n") * span_frac).cast("int"),
        ),
    )
    start = (
        hash64(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string")))
        % (F.col("__n") - span_len + 1)
    ).cast("int")
    prefix = F.slice(F.col("__tk"), 1, F.col("__start"))
    span = F.slice(
        F.col("__tk"), F.col("__start") + 1, F.col("__len")
    )
    suffix = F.slice(
        F.col("__tk"),
        F.col("__start") + F.col("__len") + 1,
        F.col("__n"),
    )
    return (
        base.withColumn("__len", span_len)
        .withColumn("__start", start)
        .select(
            id_col,
            F.array_join(
                F.concat(prefix, F.array(F.lit(sentinel)), suffix), " "
            ).alias("input_text"),
            F.array_join(
                F.concat(F.array(F.lit(sentinel)), span), " "
            ).alias("target_text"),
            F.col("__start").cast("long").alias("span_start"),
            F.col("__len").cast("long").alias("span_len"),
        )
    )
