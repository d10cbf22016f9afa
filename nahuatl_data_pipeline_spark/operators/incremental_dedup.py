"""Incremental (cross-snapshot) deduplication.

Continuous-crawl ingestion never dedups a batch in isolation — each new
batch must also be checked against everything ALREADY in the corpus.
The reference's dedup (SparkDedup.scala, deduplicators.py) is
whole-corpus only; this operator is the incremental form: new docs are
dropped when they are exact (normalized-key) or near (n-gram Jaccard ≥
threshold) duplicates of the existing snapshot, and the snapshot itself
is never rewritten.

Plan shape: exact pass = one left_anti hash join on the dedup key
(snapshot side reduced to distinct keys first — at 100 TB the key set
is the thing you keep hot, not the text). Fuzzy pass = the same
rarest-hashed-shingle bucket join as ``ngram_jaccard_pairs`` but
CROSS-corpus (new side buckets probe snapshot buckets), so cost is
Σ bucket_new × bucket_seen, never |new| × |seen|. Both passes are
incremental-friendly: the snapshot's keys/shingle buckets can be
precomputed once and reused across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.hashing import hash64, word_shingles
from nahuatl_data_pipeline_spark.functions.normalize import dedup_key


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle array, rarest-hashed-shingle bucket key)."""
    sh = (
        df.select(
            F.col(id_col).alias("__id"),
            word_shingles(text_col, n=n).alias("__sh"),
        )
        .filter(F.size("__sh") > 0)
    )
    keys = (
        sh.select("__id", F.explode("__sh").alias("__s"))
        .groupBy("__id")
        .agg(F.min(hash64(F.col("__s"))).alias("__key"))
    )
    return sh.join(keys, "__id")


def dedup_against_snapshot(
    new: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float | None = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Rows of ``new`` that duplicate nothing in ``seen``.

    Exact match: identical normalized key (``lower(trim(text))``) — the
    same key family as the q10 corpus dedup, so batch dedup and
    incremental dedup agree on what "identical" means. Near match
    (``jaccard_threshold`` not None): n-gram Jaccard at or above the
    threshold against any snapshot doc, candidates from the shared
    rarest-hashed-shingle bucket. Deterministic; never mutates or
    re-reads ``seen`` beyond its keys/shingles.
    """
    key = dedup_key(text_col)
    seen_keys = seen.select(key.alias("__k")).distinct()
    survivors = new.join(
        seen_keys, on=[dedup_key(text_col) == F.col("__k")], how="left_anti"
    )
    if jaccard_threshold is None:
        return survivors

    nsh = _shingled(survivors, id_col, text_col, shingle_n)
    ssh = _shingled(seen, id_col, text_col, shingle_n).select(
        F.col("__key"), F.col("__sh").alias("__sh_seen")
    )
    inter = F.size(F.array_intersect("__sh", "__sh_seen"))
    union = F.size(F.array_union("__sh", "__sh_seen"))
    near_ids = (
        nsh.join(ssh, "__key")
        .filter(
            (inter.cast("double") / union.cast("double")) >= jaccard_threshold
        )
        .select(F.col("__id").alias(id_col))
        .distinct()
    )
    return survivors.join(near_ids, id_col, "left_anti")
