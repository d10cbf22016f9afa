"""Fuzzy (near-duplicate) deduplication (SURVEY.md §2.4 D5, §2.10 M1, §2.3
J3/J4).

Three interchangeable strategies, all shuffle-on-bucket (never O(n²)):

- ``minhash_lsh_dedup``: pyspark.ml MinHashLSH similarity self-join —
  the direct re-expression of the reference's Scala job
  (``src/scala_examples/SparkDedup.scala:108-151``): tokenize → HashingTF →
  MinHashLSH → approxSimilarityJoin(threshold) → anti-join the losers.
  The reference collected duplicate ids to the driver (``:63-67``); here
  the removal is a distributed left_anti join (J4).

- ``banded_minhash_pairs``: engine-portable deterministic MinHash banding
  (md5 permutations from functions/hashing.py) + exact Jaccard verify —
  oracle-checkable end to end, used by the correctness gate.

- ``simhash_dedup``: 64-bit SimHash bucketing by band equality — cheapest
  at extreme scale, catches small edits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.hashing import (
    minhash_signature_cols,
    simhash64,
    word_shingles,
)


# --------------------------------------------------------------------------
# pyspark.ml MinHashLSH path (SparkDedup.scala re-expression)
# --------------------------------------------------------------------------


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.1,
    num_features: int = 1 << 18,
    num_hash_tables: int = 5,
    seed: int = 42,
    shingle_n: int = 1,
) -> DataFrame:
    """J3: LSH similarity self-join → candidate duplicate pairs
    (id_a < id_b, jaccard_distance ≤ threshold).

    Mirrors SparkDedup.scala:118-150: tokenize → HashingTF →
    MinHashLSH(5 tables) → approxSimilarityJoin; the ``idA < idB``
    theta filter removes self-pairs and symmetric twins.

    ``shingle_n > 1`` switches the token set to word n-grams — use it when
    unigram vocabularies are small relative to document length (otherwise
    every pair of documents shares most of its token *set* and the LSH
    buckets degenerate toward one giant bucket → O(n²) candidates).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    tokens = word_shingles(text_col, n=shingle_n)
    prepared = df.filter(F.col(text_col).isNotNull()).withColumn(
        "__tokens", tokens
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features", numFeatures=num_features
    )
    # MinHashLSH requires at least one non-zero feature
    prepared = tf.transform(prepared.filter(F.size("__tokens") > 0))
    lsh = MinHashLSH(
        inputCol="__features",
        outputCol="__hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(prepared)
    joined = model.approxSimilarityJoin(
        prepared, prepared, threshold, distCol="distance"
    )
    return joined.filter(
        F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}")
    ).select(
        F.col(f"datasetA.{id_col}").alias("id_a"),
        F.col(f"datasetB.{id_col}").alias("id_b"),
        F.round("distance", 6).alias("distance"),
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.1,
    **kwargs,
) -> DataFrame:
    """D5/J4: drop the higher-id member of every near-duplicate pair via a
    distributed anti-join (no driver collect)."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, threshold, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# --------------------------------------------------------------------------
# Deterministic banded MinHash (oracle-checkable)
# --------------------------------------------------------------------------


def banded_minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Candidate pairs via band-equality buckets, verified with exact
    shingle Jaccard.

    Plan shape: per-row signature (no shuffle) → explode bands (rows ×
    n_bands) → self-join on (band_id, band_key) → distinct pairs →
    exact Jaccard on the two shingle arrays → threshold filter. The join
    key is the band bucket, so cost is Σ bucket² not n².
    """
    assert num_hashes % band_size == 0
    n_bands = num_hashes // band_size

    # Shingling via nested array lambdas is interpreted (no codegen) and
    # costs ~1 ms/doc — compute it ONCE and cache; every downstream leg
    # (signatures + both Jaccard sides) reuses it.
    shd = (
        df.select(
            F.col(id_col).alias("__id"),
            word_shingles(text_col, n=shingle_n).alias("__sh"),
        )
        .filter(F.size("__sh") > 0)
        .persist()
    )

    # Signatures from EXPLODED shingles: one pass over tokens, min() is
    # insensitive to duplicate shingles, so this matches the per-row
    # array_min formulation exactly while staying in codegen.
    tok = shd.select("__id", F.explode("__sh").alias("__s"))
    sigs = tok.groupBy("__id").agg(
        *[
            F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("__s")))).alias(
                f"mh{i}"
            )
            for i in range(num_hashes)
        ]
    )

    bands = sigs.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh{b * band_size + j}")
                                for j in range(band_size)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("__id", "band.band_id", "band.band_key")

    a = bands.select(F.col("__id").alias("id_a"), "band_id", "band_key")
    b = bands.select(F.col("__id").alias("id_b"), "band_id", "band_key")
    cands = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Jaccard verify only on the (few) candidates: join the cached shingle
    # arrays back by id.
    sh_a = shd.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = shd.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with a rarest-shingle bucket
    join (each doc is bucketed by its lexicographically-smallest shingle —
    any pair with Jaccard ≥ ~0.5 almost surely shares it). Exact verify,
    approximate candidate generation, no n² blowup."""
    sh = word_shingles(text_col, n=shingle_n)
    docs = df.select(
        F.col(id_col).alias("__id"), sh.alias("__sh"), F.array_min(sh).alias("__key")
    ).filter(F.size("__sh") > 0)
    a = docs.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"), "__key"
    )
    b = docs.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"), "__key"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, "__key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_groups(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 1
) -> DataFrame:
    """64-bit SimHash per document; identical hashes ⇒ near-identical docs.
    Band the hash into 4×16-bit keys for hamming-distance-≤3 candidate
    search at scale."""
    sh = word_shingles(text_col, n=shingle_n)
    h = simhash64(sh)
    return df.select(
        F.col(id_col),
        h.alias("simhash"),
        *[
            F.shiftrightunsigned(h, 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"band{i}")
            for i in range(4)
        ],
    )
