"""Sentence segmentation + text chunking (SURVEY.md §2.9 F13/F14).

The reference segments with pysbd (``pipeline/alignment/segmentation.py:3-9``)
and packs sentences into ≤1000-char chunks with a per-document fold
(``scripts/gemini_distiller.py:38-55``). Here:

- segmentation is a pure regex projection (``regexp_extract_all`` — runs in
  whole-stage codegen, and the pattern avoids lookarounds so any RE2-based
  oracle engine computes the identical split);
- chunk packing is a greedy sequential fold per document — inherently
  ordered, so it runs as an Arrow-batched pandas_udf producing the chunk
  array per row (no shuffle: each document is one row in, one row out,
  exploded afterwards).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

ColumnOrName = Column | str

# one sentence = a run of non-terminators plus its trailing terminators.
# No lookbehind: RE2 engines (DuckDB, Go) can't evaluate (?<=...) so the
# oracle would diverge.
SENTENCE_PATTERN = r"[^.!?]+[.!?]*"


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sentences(c: ColumnOrName) -> Column:
    """array<string> of trimmed, non-empty sentences (F13)."""
    raw = F.regexp_extract_all(_col(c), F.lit(SENTENCE_PATTERN), 0)
    # one-param lambda, NOT bare F.trim: trim's optional 2nd parameter would
    # be bound by transform() to the array index and silently no-op
    return F.filter(F.transform(raw, lambda s: F.trim(s)), lambda s: s != "")


def split_sentences(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, sent_id, sentence) — posexplode keeps in-document order.

    OUTER explode: a document with NULL/sentence-free text keeps one row
    (null sent_id/sentence) instead of vanishing, so row accounting and
    id joins downstream reconcile with the input."""
    return df.select(
        F.col(id_col),
        F.posexplode_outer(sentences(text_col)).alias("sent_id", "sentence"),
    )


def chunk_text(c: ColumnOrName, max_chars: int = 1000) -> Column:
    """Greedy sentence packing into ≤max_chars chunks
    (gemini_distiller.py:38-55): sentences join with ' '; a sentence that
    would overflow the current chunk starts a new one; a single sentence
    longer than max_chars becomes its own (oversized) chunk."""

    @F.pandas_udf(ArrayType(StringType()))
    def _chunk(texts: pd.Series) -> pd.Series:
        import re

        pat = re.compile(SENTENCE_PATTERN)

        def pack(text):
            if text is None:
                return []
            sents = [s.strip() for s in pat.findall(text)]
            sents = [s for s in sents if s]
            chunks, cur = [], ""
            for s in sents:
                if not cur:
                    cur = s
                elif len(cur) + 1 + len(s) <= max_chars:
                    cur = f"{cur} {s}"
                else:
                    chunks.append(cur)
                    cur = s
            if cur:
                chunks.append(cur)
            return chunks

        return texts.map(pack)

    return _chunk(_col(c))


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, max_chars: int = 1000
) -> DataFrame:
    """(id, chunk_id, chunk, n_chars) — one row per packed chunk (F14);
    outer explode keeps chunk-less documents visible (null chunk)."""
    return df.select(
        F.col(id_col),
        F.posexplode_outer(chunk_text(text_col, max_chars)).alias(
            "chunk_id", "chunk"
        ),
    ).withColumn("chunk_n_chars", F.length("chunk"))


def token_window_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-token-window document chunking with overlap — the
    context-window splitter every pretraining/RAG pipeline runs before
    packing or embedding: each document becomes ``ceil((n - overlap) /
    stride)`` windows of ``chunk_tokens`` whitespace tokens starting
    every ``stride = chunk_tokens - overlap`` tokens, the final window
    keeping whatever remains. Complements ``chunk_text`` (sentence
    packing by characters, the reference's F14 shape) and
    ``operators/packing.py`` (cross-document concat-and-chop): this is
    the per-document token-aligned variant whose overlap preserves
    context across boundaries.

    Output: ``(id, chunk_idx, chunk_text, n_tokens)`` — one row per
    window, token-less documents dropped (no window to emit). Chunk
    text is the ``' '``-join of the window's tokens: intra-document
    whitespace is normalized BY CONSTRUCTION (token-level windows have
    no byte-faithful representation; callers needing original bytes
    keep offsets instead).

    Plan: pure JVM expressions end-to-end — tokenize once, an integer
    window count, ``explode(sequence(...))`` + ``slice`` —  no Python
    boundary, no shuffle at all (chunking is embarrassingly row-local;
    the explode multiplies rows in place). At 100 TB this pipelines
    inside whatever scan feeds it.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} / {chunk_tokens}"
        )
    from nahuatl_data_pipeline_spark.functions.text_analysis import tokens

    stride = chunk_tokens - overlap
    base = (
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .withColumn("__n", F.size("__tk"))
        .where(F.col("__n") >= 1)
    )
    # exact integer ceil((n - overlap) / stride), floored at 1 so every
    # non-empty doc emits at least one window
    k = F.greatest(
        F.lit(1),
        F.floor(
            (F.col("__n") - F.lit(overlap) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("int"),
    )
    start = F.col("chunk_idx") * stride
    win = F.slice(F.col("__tk"), start + 1, chunk_tokens)
    return (
        base.withColumn("__k", k)
        .select(
            id_col,
            "__tk",
            F.explode(
                F.sequence(F.lit(0), F.col("__k") - 1)
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join(win, " ").alias("chunk_text"),
            F.size(win).cast("long").alias("n_tokens"),
        )
    )
