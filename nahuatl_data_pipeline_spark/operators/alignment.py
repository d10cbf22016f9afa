"""Embedding-based sentence alignment (SURVEY.md §2.3 J5; reference
``pipeline/alignment/aligner.py:15-50``: LaBSE-encode both sides, FAISS
``IndexFlatIP`` top-1, keep pairs with cosine ≥ 0.85).

Spark shape: embed each side with the pluggable encoder (functions/
embeddings.py), broadcast the smaller side, exact cosine top-1 per query
via one window, threshold filter — the FAISS index is replaced by the
broadcast + per-partition scoring (exact, no index build), or by
``similarity.lsh_topk`` when both sides are too large to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.embeddings import embed_text
from nahuatl_data_pipeline_spark.operators.similarity import cosine_topk


def align_sentences(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    min_score: float = 0.85,
    dim: int = 64,
    encode_fn=None,
) -> DataFrame:
    """Top-1 cross-lingual alignment: for each left row, the best-cosine
    right row with score ≥ min_score → (left_text, right_text, score).

    ``left`` is the query side (broadcast by cosine_topk) — pass the
    smaller corpus there, exactly like the reference indexes the larger
    side in FAISS and queries with the smaller (aligner.py:34-42).
    """
    lid, rid = "__align_lid", "__align_rid"
    # ids = content hashes, not monotonically_increasing_id: branch
    # re-evaluation under AQE must reproduce the same id for the join-back
    # Dedup BEFORE embedding (id = hash of the text, so every duplicate
    # row has an identical embedding — encoding them first was pure
    # waste), and spread a narrow input before the encoder pandas_udf so
    # a single-file corpus doesn't run the model on one core (the
    # similarity.py cosine-pairs pattern; no-op at cluster scale).
    par = left.sparkSession.sparkContext.defaultParallelism

    def _base(raw: DataFrame, key: str, text: str, tag: str) -> DataFrame:
        # One deduped (key, text) frame per side, shared by the encoder
        # leg and the text join-back — its top exchange is reused across
        # both consumers, so dedup and spread each run once. The
        # narrowness probe reads the RAW scan's split count (stable; an
        # AQE-coalesced dedup output reports its pre-runtime estimate);
        # repartition(n) is explicit, so AQE will not re-coalesce it
        # back to one partition under the encoder.
        d = raw.withColumn(key, F.xxhash64(F.lit(tag), F.col(text)))
        d = d.dropDuplicates([key]).select(key, text)
        return d.repartition(par) if raw.rdd.getNumPartitions() < par else d

    l_base = _base(left, lid, left_text, "L")
    r_base = _base(right, rid, right_text, "R")
    l_emb = l_base.withColumn(
        "__v", embed_text(left_text, dim=dim, encode_fn=encode_fn)
    ).filter(F.col("__v").isNotNull())
    r_emb = r_base.withColumn(
        "__v", embed_text(right_text, dim=dim, encode_fn=encode_fn)
    ).filter(F.col("__v").isNotNull())
    top1 = cosine_topk(
        l_emb.select(F.col(lid).alias("vec_id"), F.col("__v").alias("embedding")),
        r_emb.select(F.col(rid).alias("vec_id"), F.col("__v").alias("embedding")),
        k=1,
        exclude_self=False,
    ).filter(F.col("cosine") >= min_score)
    # Join back on the encoder-free base frames: the embedding column is
    # not needed to recover the texts (until r13 the join-back reused
    # l_emb/r_emb, whose __v null-filter kept the encoder alive in these
    # legs). A null-embedding row can't appear in top1, so the inner
    # join excludes it either way.
    return (
        top1.join(
            l_base.select(F.col(lid).alias("query_id"), F.col(left_text)),
            "query_id",
        )
        .join(
            r_base.select(F.col(rid).alias("neighbor_id"), F.col(right_text)),
            "neighbor_id",
        )
        .select(
            F.col(left_text),
            F.col(right_text),
            F.col("cosine").alias("score"),
        )
    )
