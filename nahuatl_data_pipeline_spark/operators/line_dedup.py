"""Corpus-wide line/sentence-level deduplication (C4 / RefinedWeb style).

Web-scale cleaning pipelines remove *repeated lines* across the whole
corpus, not just repeated documents: boilerplate ("click here to
subscribe"), navigation text and license headers recur across millions
of pages, and C4 (Raffel et al. 2020) / RefinedWeb (Penedo et al. 2023)
drop every occurrence after the first. The reference dedups only whole
records (``src/pipeline/deduplication.py``); this is the finer-grained
pass that operates inside documents.

Pipeline shape (all shuffles are on keys that scale):

    explode sentences (codegen regex, in-document order kept)
      → keep-first per normalized sentence key
        (one shuffle, partitioned BY SENTENCE KEY — the corpus-wide
         dedup state is sharded, never a driver set)
      → reassemble surviving sentences per document in original order
        (one shuffle on the document id)

Keep-first order is (doc_key, position) — deterministic and partition
independent. Fully engine-portable: the oracle replays the identical
regex split + window + ordered string-agg in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.segmentation import split_sentences


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_kept: int = 0,
) -> DataFrame:
    """Drop every occurrence after the first of each repeated sentence.

    Returns one row per input document: ``id_col``, ``text_clean`` (the
    surviving sentences rejoined with a single space, '' if none
    survive or the text had no sentences), ``n_kept`` and ``n_total``
    sentence counts. Documents whose text is NULL stay visible with
    ``text_clean=''`` and zero counts. ``min_kept`` > 0 additionally
    drops documents retaining fewer than that many sentences (the
    C4-style post-filter).

    The sentence key is ``lower(sentence)`` (sentences are already
    trimmed); first occurrence = smallest (``id_col``, position).

    Keep-first is computed as ``min(struct(id, pos))`` per key — a hash
    aggregation with MAP-SIDE partial combine — rather than a
    ``row_number`` window: a window would sort each key's rows in one
    task, and the hot boilerplate keys this operator exists to remove
    are exactly the keys that would straggle/OOM it at corpus scale.
    """
    s = split_sentences(df, id_col, text_col).filter(
        F.col("sentence").isNotNull()
    )
    firsts = s.groupBy(F.lower(F.col("sentence")).alias("__key")).agg(
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col("sent_id").alias("p"))
        ).alias("__first")
    )
    flagged = s.join(
        firsts, F.lower(s["sentence"]) == F.col("__key")
    ).withColumn(
        "__keep",
        (F.col(id_col) == F.col("__first.i"))
        & (F.col("sent_id") == F.col("__first.p")),
    )
    # collect_list skips nulls, so the when() collects kept sentences only
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct("sent_id", "sentence"),
                        )
                    )
                ),
                lambda x: x["sentence"],
            ),
            " ",
        ).alias("text_clean"),
    )
    out = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("n_total", F.lit(0)).alias("n_total"),
        )
    )
    if min_kept > 0:
        out = out.filter(F.col("n_kept") >= min_kept)
    return out
