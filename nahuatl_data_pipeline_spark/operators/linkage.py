"""Entity resolution / record linkage: blocked fuzzy string matching.

The dedup family (operators/fuzzy_dedup.py) matches DOCUMENTS by shingle
overlap; record linkage matches short STRINGS (names, titles, addresses)
by edit distance — a different regime: token sets are tiny, so
Jaccard/minhash degenerate, and the right primitive is
levenshtein-within-blocks, the classic ER blocking pattern.

Plan shape: block key projection (narrow) → self-join on the block key
(hash equi-join; cost Σ block², never n²) → edit-distance filter
evaluated JVM-side (``F.levenshtein`` with the threshold pushed into
the expression — Spark short-circuits the DP once the bound is
exceeded). The hot-block caveat and its cap mitigation are the same as
banded LSH (fuzzy_dedup.py:banded_minhash_pairs ``max_bucket_size``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Generation-based cache management, mirroring fuzzy_dedup.py's contract
# but with a SEPARATE generation: each capped linkage call releases the
# previous linkage call's persisted block frame. A shared generation
# with fuzzy_dedup would let a linkage call evict an in-flight fuzzy
# call's shingle caches (and vice versa) when the families interleave.
_LIVE_CACHES: list[DataFrame] = []


def release_linkage_caches() -> None:
    """Unpersist intermediates cached by earlier linkage calls."""
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:
            pass  # session already stopped


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    max_distance: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) whose ``text_col`` values share a ``block``
    key and sit within ``max_distance`` edits; output carries the
    distance. ``block`` is any deterministic expression over the row
    (prefix, phonetic key, sorted-token key) — recall is bounded by it:
    a true match in different blocks is never compared, which is the
    deliberate scale trade (compare-everything is n²).

    ``max_block_size`` sheds oversized blocks before the join (hot-key
    guard, same contract as the LSH bucket cap).
    """
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        block.alias("__blk"),
    ).filter(F.col("__blk").isNotNull())
    if max_block_size is not None:
        sizes = keyed.groupBy("__blk").agg(F.count(F.lit(1)).alias("__bc"))
        # materialize: both a/b self-join legs consume `keyed`, and an
        # unmaterialized semi-join would re-run the scan + sizes
        # aggregate per leg (4 input scans instead of 1 — the round-5
        # exchange-reuse trap), on exactly the large-corpus runs the
        # cap targets. persist (recomputable on executor loss), NOT
        # localCheckpoint (executor-local, unrecoverable on a real
        # cluster); lifetime rides linkage's OWN cache generation —
        # NOT fuzzy_dedup's, which would evict an in-flight fuzzy
        # call's shingle caches when the two families interleave.
        release_linkage_caches()  # BEFORE persisting (ordering contract)
        keyed = keyed.join(
            sizes.filter(F.col("__bc") <= max_block_size), ["__blk"],
            "left_semi",
        ).persist()
        keyed.count()  # eager: both self-join legs read the cache
        _LIVE_CACHES.append(keyed)
    a = keyed.select(
        F.col("__id").alias("id_a"), F.col("__t").alias("text_a"), "__blk"
    )
    b = keyed.select(
        F.col("__id").alias("id_b"), F.col("__t").alias("text_b"), "__blk"
    )
    # threshold-bounded levenshtein: Spark abandons the DP row once the
    # running minimum exceeds the bound — O(d·len) not O(len²) per pair
    dist = F.levenshtein("text_a", "text_b", max_distance)
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", dist)
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
        .select("id_a", "id_b", "text_a", "text_b", "distance")
    )


def prefix_block(text_col: str, n_chars: int = 5) -> Column:
    """The simplest blocking key: lowercased first ``n_chars``. Cheap
    and effective for typo-class errors (edits rarely hit the prefix);
    swap in a phonetic or sorted-token key for transposition-heavy
    data. Empty/short strings block on what they have."""
    return F.substring(F.lower(F.col(text_col)), 1, n_chars)
