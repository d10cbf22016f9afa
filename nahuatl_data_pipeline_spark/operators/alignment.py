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
    l_emb = (
        left.withColumn(lid, F.xxhash64(F.lit("L"), F.col(left_text)))
        .withColumn("__v", embed_text(left_text, dim=dim, encode_fn=encode_fn))
        .filter(F.col("__v").isNotNull())
        .dropDuplicates([lid])
    )
    r_emb = (
        right.withColumn(rid, F.xxhash64(F.lit("R"), F.col(right_text)))
        .withColumn("__v", embed_text(right_text, dim=dim, encode_fn=encode_fn))
        .filter(F.col("__v").isNotNull())
        .dropDuplicates([rid])
    )
    top1 = cosine_topk(
        l_emb.select(F.col(lid).alias("vec_id"), F.col("__v").alias("embedding")),
        r_emb.select(F.col(rid).alias("vec_id"), F.col("__v").alias("embedding")),
        k=1,
        exclude_self=False,
        # embed_text emits exactly `dim` buckets → the codegen'd unrolled
        # cosine applies (cosine_cols docstring; bit-identical fold)
        dim=dim,
    ).filter(F.col("cosine") >= min_score)
    return (
        top1.join(
            l_emb.select(F.col(lid).alias("query_id"), F.col(left_text)),
            "query_id",
        )
        .join(
            r_emb.select(F.col(rid).alias("neighbor_id"), F.col(right_text)),
            "neighbor_id",
        )
        .select(
            F.col(left_text),
            F.col(right_text),
            F.col("cosine").alias("score"),
        )
    )
