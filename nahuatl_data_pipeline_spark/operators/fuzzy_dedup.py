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

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.hashing import word_shingles
from nahuatl_data_pipeline_spark.functions.spread import spread_narrow

# Generation-based cache management: each fuzzy-dedup call releases the
# PREVIOUS call's persisted shingle/candidate intermediates and registers
# its own. The current result's caches stay valid however the caller
# chains/derives from it (a GC- or result-lifetime tie would evict them
# the moment the returned object is dropped — e.g. `f(df).select(...)`),
# while a long-lived session holds at most one call's caches instead of
# leaking monotonically. Concurrent fuzzy-dedup calls in one session
# should call release_fuzzy_caches() themselves once both results are
# materialized.
_LIVE_CACHES: list[DataFrame] = []

# Observability: banded_minhash_pairs records its candidate-pair count
# here (the count is computed anyway for the broadcast size gate). Scale
# probes (SCALE.md's pair-family table) read it to report candidate
# growth vs true output without re-running the banding.
LAST_STATS: dict[str, int] = {}


def release_fuzzy_caches() -> None:
    """Unpersist intermediates cached by earlier fuzzy-dedup calls."""
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:
            pass  # session already stopped


def _register_caches(*cached: DataFrame) -> None:
    _LIVE_CACHES.extend(cached)


# IMPORTANT ordering contract: release_fuzzy_caches() must run at the
# START of each call, BEFORE the call creates its own persists. Spark's
# CacheManager matches cached plans by canonical form, so if call N+1
# persists a plan identical to call N's (same corpus, same params) and
# THEN unpersists call N's handle, the shared cache entry dies and call
# N+1 executes fully uncached — with the shingle pandas_udf recomputed
# per join leg (measured: 14 s → 78 s on back-to-back sf1 q38 runs).
# Persisted frames are also materialized EAGERLY (a count) before being
# wired into self-joins: two legs of one job racing to populate a lazy
# cache each recompute the partitions the other hasn't finished.


# --------------------------------------------------------------------------
# pyspark.ml MinHashLSH path (SparkDedup.scala re-expression)
# --------------------------------------------------------------------------


# MinHash hash coefficients depend only on (num_features, num_hash_tables,
# seed) — never on the data — so one fitted model is reusable across every
# corpus in a session. Spark's LSH ``fit`` runs a head() job just to read
# the input dimension; caching skips that job AND the per-call JVM model
# construction (VERDICT r04 "Next round" #4).
_MINHASH_MODELS: dict[tuple[int, int, int], object] = {}


def _minhash_model(
    prepared: DataFrame, num_features: int, num_hash_tables: int, seed: int
):
    from pyspark.ml.feature import MinHashLSH

    key = (num_features, num_hash_tables, seed)
    model = _MINHASH_MODELS.get(key)
    if model is None:
        model = MinHashLSH(
            inputCol="__features",
            outputCol="__hashes",
            numHashTables=num_hash_tables,
            seed=seed,
        ).fit(prepared)
        _MINHASH_MODELS[key] = model
    return model


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

    The tokenized+hashed frame is persisted for the duration of the call
    chain (generation-managed like the banded path): the self-join
    consumes it as BOTH sides, so without the persist every shingle and
    TF vector is computed twice.

    Dirty-corpus envelope: approxSimilarityJoin has no hot-bucket cap
    lever, so on a corpus with B-member duplicate families it carries
    the full Σ C(B,2) candidate volume. Resource sizing measured at the
    100× decade: round 9 recorded an 8 GiB fresh-JVM OOM on both
    replica flavors; round 10 root-caused it to the unpruned cache
    (text + shingle array persisted alongside the features) — with the
    cache pruned to (id, features) a fresh 8 GiB heap completes both
    flavors (unique 211.7 s, clone 432.4 s ≈ the old 16 GiB walls), so
    the isolate schedule runs this job at the default heap again. The
    capped deterministic path (``banded_minhash_pairs`` with
    ``max_bucket_size``) is the production choice for dirty corpora;
    this path exists for SparkDedup.scala parity and clean corpora.
    """
    from pyspark.ml.feature import HashingTF
    from pyspark.storagelevel import StorageLevel

    release_fuzzy_caches()  # BEFORE persisting (see ordering contract)
    tokens = word_shingles(text_col, n=shingle_n)
    prepared = df.filter(F.col(text_col).isNotNull()).withColumn(
        "__tokens", tokens
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features", numFeatures=num_features
    )
    # MinHashLSH requires at least one non-zero feature. Persist ONLY
    # (id, features): a .persist() materializes every column of its
    # plan — Catalyst cannot prune THROUGH a cache — so carrying text +
    # the shingle array into the cache multiplies its footprint by the
    # document size for columns no downstream consumer reads (the join
    # needs __features, the output only the ids). Measured at the 100×
    # decade: the unpruned cache was the allocation behind the 16 GiB
    # fresh-JVM floor (SCALE.md round 10).
    prepared = (
        tf.transform(prepared.filter(F.size("__tokens") > 0))
        .select(id_col, "__features")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prepared.count()  # eager: both self-join legs read the cache
    _register_caches(prepared)
    model = _minhash_model(prepared, num_features, num_hash_tables, seed)
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


def _signature_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    num_hashes: int,
    band_size: int,
    persist_shd: bool = True,
    persist_sigs: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Shared shingle → minhash signature → exploded band-key legs of
    the banded pipeline. Returns (shd, bands); ``shd`` (the persisted
    shingle frame) is eager-cached — the caller owns registering it via
    ``_register_caches`` once its own derived frames exist.

    ``persist_sigs=True`` additionally caches the SIGNATURE frame (one
    row per doc, ``num_hashes`` longs — the pipeline's narrowest frame,
    orders smaller than ``shd``'s shingle arrays) and registers it for
    release. For consumers that read ``bands`` from two places — the
    uncapped band self-join's legs — this is the r13-verdict task #3
    fix: AQE does NOT reuse the identical signature-aggregate exchange
    across the legs (measured ReusedExchange=0 at sf0.1), so without
    the cache each leg replays the plan's biggest shuffle (shingle
    explode → hash → min-aggregate). With it, each leg is a narrow
    band explode over cached rows. Eager (count) per the module's
    racing-legs contract.

    Shingling via nested array lambdas is interpreted (no codegen) and
    costs ~1 ms/doc — computed ONCE and cached; every downstream leg
    (signatures + both Jaccard sides) reuses it. Signatures come from
    EXPLODED shingles: md5+hex-parse runs once per token inside
    whole-stage codegen, and the k components are k cheap integer mins
    in the same hash aggregate — partial (map-side) agg shrinks the
    shuffle to one row per doc. min() is insensitive to duplicate
    shingles, so this equals the per-row array_min formulation exactly.

    ``persist_shd=False`` skips the persist AND its eager-count job:
    right for a side known to be small (a broadcast eval suite), where
    re-running the Arrow shingling per consuming leg costs less than a
    dedicated materialization job (r13 — the q157 eval side).
    """
    from nahuatl_data_pipeline_spark.functions.hashing import (
        MINHASH_P,
        hash64,
        minhash_constants,
    )

    n_bands = num_hashes // band_size
    # Spread a narrow input before the Arrow shingling: a corpus that
    # arrives as a handful of scan splits (small files, a filtered
    # union) would run the pandas_udf — the family's dominant per-row
    # cost — on that handful of cores. One narrow (id, text) round-robin
    # exchange buys full parallelism for the shingling, the signature
    # aggregate and both verify legs reading the cache; a no-op whenever
    # the input already has >= defaultParallelism partitions (the
    # similarity.py cosine-pairs pattern). Everything downstream is
    # content-keyed, so the result is partition-independent by design.
    # (spread_narrow never probes an exchange-bearing input — it passes
    # through rather than silently materializing AQE stages.)
    df = spread_narrow(df)
    shd = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(text_col, n=shingle_n).alias("__sh"),
    ).filter(F.size("__sh") > 0)
    if persist_shd:
        shd = shd.persist()
        shd.count()  # eager: signature leg + both Jaccard sides read the cache

    tok = shd.select("__id", F.explode("__sh").alias("__s")).withColumn(
        "__hv", hash64(F.col("__s"))
    )
    sigs = tok.groupBy("__id").agg(
        *[
            F.min((F.lit(a) * F.col("__hv") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
            for i, (a, b) in enumerate(minhash_constants(num_hashes))
        ]
    )
    if persist_sigs:
        # bounded: one row per doc × num_hashes longs. Eager count per
        # the racing-legs contract; registered here (the caller has
        # already released the previous generation before calling).
        sigs = sigs.persist()
        sigs.count()
        _register_caches(sigs)

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
    return shd, bands


def _band_bucket_sizes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Diagnostic: one row per band bucket with its member count ``c``
    — Σ c·(c−1)/2 is the raw candidate volume of the banded self-join
    and the max ``c`` bounds the hottest join task. Used by the scale
    probes to diagnose hot-bucket skew WITHOUT running the join."""
    release_fuzzy_caches()
    shd, bands = _signature_bands(
        df, id_col, text_col, shingle_n, num_hashes, band_size
    )
    _register_caches(shd)
    return bands.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("c")
    )


def banded_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 6,
    band_size: int = 2,
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """The candidate-generation half of the banded pipeline, shared by
    every operator that wants banded-minhash pruning with its own verify
    metric (Jaccard here; tf-idf cosine in operators/tfidf.py).

    Returns ``(shd, cands, n_cands)``: the persisted shingle frame
    (``__id``, ``__sh``), the persisted + eagerly materialized distinct
    candidate pair frame (``id_a`` < ``id_b``), and its size (computed
    anyway for the callers' broadcast gates; also recorded in
    ``LAST_STATS``). Both frames are registered with the call's cache
    generation — callers must NOT call ``release_fuzzy_caches`` after
    this returns until they are done with the result.

    Plan shape: per-row signature (no shuffle) → explode bands (rows ×
    n_bands) → self-join on (band_id, band_key) → distinct pairs. The
    join key is the band bucket, so cost is Σ bucket² not n².
    ``max_bucket_size`` is the hot-bucket guard (see
    :func:`banded_minhash_pairs` for the recall contract).
    """
    assert num_hashes % band_size == 0
    release_fuzzy_caches()  # BEFORE persisting (see ordering contract)
    shd, bands = _signature_bands(
        df, id_col, text_col, shingle_n, num_hashes, band_size,
        # Uncapped self-join: both legs read `bands`, and AQE does NOT
        # reuse the identical signature-aggregate exchange across them
        # (r14 probe: ReusedExchange=0) — so the r13 note ("caching
        # showed no improvement") measured the wrong frame: persisting
        # the post-explode BANDS adds n_bands× rows of materialization,
        # while persisting the pre-explode SIGNATURES (one narrow row
        # per doc) removes the duplicated explode→hash→min-agg shuffle
        # for the cost of the smallest frame in the pipeline. The
        # capped path consumes bands exactly once (window → filter →
        # collect_list) — nothing to share, keep it cache-free.
        persist_sigs=max_bucket_size is None,
    )
    if max_bucket_size is not None:
        # Capped path (r13): ONE linear chain instead of the old
        # sizes-aggregate + left_semi + bands-persist + self-join. A
        # count window on the band key marks each bucket's size (same
        # exchange the old semi-join needed anyway), oversized buckets
        # are dropped, and the survivors — now provably ≤ cap members —
        # are folded per bucket with collect_list and exploded twice
        # into ordered pairs. Exploding each ≤cap-sized bucket's id
        # list into (id_a < id_b, deduped) pairs emits exactly the pair
        # set of the old band-key self-join restricted to buckets ≤ cap,
        # so the result is output-identical; what changes is the plan:
        # the signature aggregate runs ONCE (the semi-join's two legs
        # each re-derived it — one whole duplicate shuffle gone), the
        # intermediate bands persist + eager count job disappears, and
        # the groupBy after the window reuses the window's partitioning
        # (no extra exchange). collect_list buffers are bounded by the
        # cap BECAUSE the window filter runs first — never fold an
        # uncapped bucket into an array (a dense-corpus mega-bucket
        # would sit in one aggregation buffer; the uncapped path below
        # keeps the streaming self-join for exactly that reason).
        from pyspark.sql import Window

        capped = bands.withColumn(
            "__bc",
            F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_key")),
        ).filter(F.col("__bc") <= max_bucket_size)
        grouped = capped.groupBy("band_id", "band_key").agg(
            F.collect_list("__id").alias("__ids")
        )
        cands = (
            grouped.select(F.explode("__ids").alias("id_a"), "__ids")
            .select("id_a", F.explode("__ids").alias("id_b"))
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
            .persist()
        )
    else:
        a = bands.select(F.col("__id").alias("id_a"), "band_id", "band_key")
        b = bands.select(F.col("__id").alias("id_b"), "band_id", "band_key")
        cands = (
            a.join(b, ["band_id", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
            .persist()
        )
    n_cands = cands.count()
    LAST_STATS["banded_candidates"] = n_cands
    _register_caches(shd, cands)
    return shd, cands, n_cands


def banded_minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.8,
    broadcast_max_candidates: int = 2_000_000,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate pairs via band-equality buckets, verified with exact
    shingle Jaccard.

    ``max_bucket_size`` is the hot-bucket guard for dirty corpora: a
    band bucket of B docs emits B² candidate rows in ONE join task, so
    a handful of mega-buckets (hash collisions on short docs, giant
    families of unremoved identical docs) can stall the stage for hours
    while every other task idles — observed on the 100× replica
    (SCALE.md). With the cap set, buckets over the limit are dropped
    before the self-join (one partial-count aggregate + a semi-join on
    the band key). Recall contract: a pair is lost only if EVERY band
    it shares is oversized; run ``exact_dedup`` first so byte-identical
    families (true mega-buckets) never reach LSH, and the cap then
    sheds only collision buckets, which are overwhelmingly false
    candidates. Default None = no cap; since round 8 the q25/q108
    registered queries pass 150 (the production posture probed at
    100×), with the cap replicated in their oracles via the shared
    CTE builder.

    Plan shape: per-row signature (no shuffle) → explode bands (rows ×
    n_bands) → self-join on (band_id, band_key) → distinct pairs →
    exact Jaccard on the two shingle arrays → threshold filter. The join
    key is the band bucket, so cost is Σ bucket² not n².

    The candidate set is counted (it is persisted, so the count also
    pre-materializes what the verify join reuses): at or under
    ``broadcast_max_candidates`` it is broadcast, so the wide shingle
    arrays never shuffle; above it — a dirty corpus where near-dup pairs
    are NOT sparse (crawl dumps can exceed 30% duplicates) — the verify
    falls back to an ordinary shuffle join instead of overflowing the
    driver/executor broadcast limit.
    """
    shd, cands, n_cands = banded_candidate_pairs(
        df,
        id_col,
        text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        band_size=band_size,
        max_bucket_size=max_bucket_size,
    )
    # Size-gate the broadcast: sparse candidate sets (the normal case)
    # broadcast so the wide shingle arrays never shuffle; dense ones
    # (dirty corpus) take a shuffle join rather than blowing the limit.
    cand_side = F.broadcast(cands) if n_cands <= broadcast_max_candidates else cands
    # Jaccard verify only on the candidates: join the cached shingle
    # arrays back by id.
    sh_a = shd.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = shd.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    out = (
        cand_side.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return out  # shd/cands already cache-registered by banded_candidate_pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 6,
    band_size: int = 2,
    broadcast_max_candidates: int = 2_000_000,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with banded-minhash candidate
    generation (3 bands × 2 hashes by default) and an exact shingle
    Jaccard verify.

    History: this operator originally bucketed on the single minimum
    *hashed* shingle (1-band MinHash) — a pair with Jaccard J collides
    with probability J, so LOW-Jaccard pairs still collide proportionally
    and common-shingle buckets are overwhelmingly false candidates. The
    100× replica measured 131M raw candidates for 25.8M true pairs
    (SCALE.md round 6, ~5× waste). Banding with ``band_size``-hash keys
    drops a pair's per-band collision probability to J^band_size, which
    crushes the low-J tail while ``num_hashes/band_size`` independent
    bands keep high-J recall (J=0.9 → 96.4% with 3 bands vs 90% for the
    single-band scheme). Candidate generation, caching, the broadcast
    size gate, and the ``max_bucket_size`` hot-bucket guard are all the
    shared :func:`banded_minhash_pairs` machinery — this wrapper exists
    for its distinct parameter profile and call sites (q38/q58, the
    curation pipeline's cluster-dedup stage).
    """
    return banded_minhash_pairs(
        df,
        id_col,
        text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        band_size=band_size,
        jaccard_threshold=jaccard_threshold,
        broadcast_max_candidates=broadcast_max_candidates,
        max_bucket_size=max_bucket_size,
    )


# --------------------------------------------------------------------------
# Build-once shared pair table (round 8 — VERDICT r7 task #2)
# --------------------------------------------------------------------------

# (applicationId, corpus_key, params…) → persisted verified-pair frame.
# Separate pool from _LIVE_CACHES: pair tables survive across fuzzy-dedup
# calls (that is their point), bounded by _PAIR_TABLE_MAX entries (LRU).
# 2, not more: only two pair-graph corpora exist per sf_dir (q38's and
# q58's), and at the 100× clone decade each table is ~25M rows — holding
# four of those in one 8 GiB local-mode JVM squeezed the heap enough to
# tip q31's own LSH join into OOM during the round-8 full sweep.
_PAIR_TABLE_CACHE: dict[tuple, DataFrame] = {}
_PAIR_TABLE_MAX = 2
# Guards the CACHE DICT only (lookup/LRU/evict), never the Spark compute:
# the test suite overlaps independent queries on one session (guide
# §2.6), and an unguarded evict loop could pop a key another thread
# already evicted. A concurrent miss on the same key still double-
# computes (benign — last insert wins, the loser stays usable).
_PAIR_TABLE_LOCK = threading.Lock()


def release_pair_tables() -> None:
    """Unpersist every cached shared pair table (test/session teardown)."""
    while _PAIR_TABLE_CACHE:
        _, df = _PAIR_TABLE_CACHE.popitem()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    corpus_key: str,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 6,
    band_size: int = 2,
    broadcast_max_candidates: int = 2_000_000,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Build-once near-dup pair table: :func:`ngram_jaccard_pairs`, but
    the verified pair set is persisted and memoized under ``corpus_key``
    so every consumer of the SAME pair graph — pair listing (q38),
    degree profiling (q97), component clustering (q58), best-rep
    selection (q145) — pays the shingle/band/verify pipeline ONCE per
    session instead of re-deriving it per query (q97 was spending 57 s
    of its 30× wall rebuilding q38's 2.3M-pair graph, SCALE.md round 7).

    ``corpus_key`` is the caller's contract: two calls may share a key
    ONLY if they pass identical (rows, params) inputs — the registry's
    shared corpus builders (``q38_corpus``/``q58_corpus``) are the
    intended key owners. The cache is per Spark application (the key
    embeds ``applicationId``, so a restarted session never sees stale
    handles) and holds at most ``_PAIR_TABLE_MAX`` tables, evicted LRU
    with an unpersist. The pair table is small relative to its corpus —
    one row per verified near-dup pair — which is what makes persist
    the right contract where caching the corpus itself would not be.
    """
    key = (
        df.sparkSession.sparkContext.applicationId,
        corpus_key,
        id_col,
        text_col,
        shingle_n,
        jaccard_threshold,
        num_hashes,
        band_size,
        max_bucket_size,
    )
    with _PAIR_TABLE_LOCK:
        hit = _PAIR_TABLE_CACHE.pop(key, None)
        if hit is not None:
            _PAIR_TABLE_CACHE[key] = hit  # re-insert: LRU recency
            LAST_STATS["pair_table_hit"] = 1
            return hit
    pairs = ngram_jaccard_pairs(
        df,
        id_col,
        text_col,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        num_hashes=num_hashes,
        band_size=band_size,
        broadcast_max_candidates=broadcast_max_candidates,
        max_bucket_size=max_bucket_size,
    ).persist()
    pairs.count()  # materialize BEFORE releasing the build intermediates
    release_fuzzy_caches()  # shd/cands are baked into the pair table now
    with _PAIR_TABLE_LOCK:
        while len(_PAIR_TABLE_CACHE) >= _PAIR_TABLE_MAX:
            old = _PAIR_TABLE_CACHE.pop(next(iter(_PAIR_TABLE_CACHE)))
            try:
                old.unpersist()
            except Exception:
                pass
        _PAIR_TABLE_CACHE[key] = pairs
    return pairs


# --------------------------------------------------------------------------
# Fuzzy bipartite decontamination (round 8)
# --------------------------------------------------------------------------


def _maybe_broadcast(df: DataFrame, do_broadcast: bool) -> DataFrame:
    return F.broadcast(df) if do_broadcast else df


def fuzzy_decontamination_pairs(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    shingle_n: int = 3,
    num_hashes: int = 6,
    band_size: int = 2,
    jaccard_threshold: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train documents NEAR-duplicating an eval/benchmark document:
    the fuzzy complement of ``curation.contamination_flags`` (exact
    13-gram window overlap). A paraphrased or lightly-edited benchmark
    leak — reworded question, renumbered answer list, whitespace-mangled
    copy — shares few or no EXACT 13-gram windows with its source, so
    the published exact protocol misses it while its 3-gram shingle
    Jaccard stays high; this operator catches exactly that band.

    Plan: banded-minhash signatures on BOTH sides (the shared
    :func:`_signature_bands` machinery — same scheme as q25/q38/q108, so
    recall behavior is the documented J^band_size-per-band curve), then
    a BIPARTITE band-key join (train bands ⨝ eval bands — never a self
    join, so cost is Σ_bucket |train|·|eval|, linear in the train side
    for a fixed eval suite) → distinct candidate pairs → exact shingle
    Jaccard verify. The eval side (bands and shingle arrays) is
    broadcast: benchmark suites are MBs against a 100 TB corpus, which
    makes the whole probe shuffle-free on the train side except the
    final per-pair dedup — the same asymmetry contract as the exact
    operator. ``broadcast_eval=False`` is the escape hatch when the
    "eval" side is another full corpus (cross-corpus near-dup audit):
    both joins fall back to shuffle joins, result-identical (tested).

    Output: one row per (train ``id_col``, eval id, jaccard ≥
    threshold). Roll up with :func:`fuzzy_contamination_flags` for the
    scrub-by-anti-join shape.
    """
    eval_id = eval_id_col or id_col
    release_fuzzy_caches()  # BEFORE persisting (see ordering contract)
    tr_shd, tr_bands = _signature_bands(
        train.select(F.col(id_col), F.col(text_col)),
        id_col, text_col, shingle_n, num_hashes, band_size,
    )
    # broadcast_eval ⇒ the eval side is small by contract: skip its
    # persist + eager-count job and let the two consuming legs (bands
    # + verify shingles) recompute the tiny Arrow shingling inline —
    # one fewer job barrier per call (r13). The non-broadcast escape
    # hatch (eval side is another full corpus) keeps the cache.
    ev_shd, ev_bands = _signature_bands(
        evalset.select(F.col(eval_id).alias(id_col), F.col(text_col)),
        id_col, text_col, shingle_n, num_hashes, band_size,
        persist_shd=not broadcast_eval,
    )
    if broadcast_eval:
        _register_caches(tr_shd)
    else:
        _register_caches(tr_shd, ev_shd)
    cands = (
        tr_bands.select(
            F.col("__id").alias("train_id"), "band_id", "band_key"
        )
        .join(
            _maybe_broadcast(
                ev_bands.select(
                    F.col("__id").alias("eval_id"), "band_id", "band_key"
                ),
                broadcast_eval,
            ),
            ["band_id", "band_key"],
        )
        .select("train_id", "eval_id")
        .dropDuplicates(["train_id", "eval_id"])
    )
    sh_t = tr_shd.select(
        F.col("__id").alias("train_id"), F.col("__sh").alias("sh_t")
    )
    sh_e = ev_shd.select(
        F.col("__id").alias("eval_id"), F.col("__sh").alias("sh_e")
    )
    inter = F.size(F.array_intersect("sh_t", "sh_e"))
    union = F.size(F.array_union("sh_t", "sh_e"))
    return (
        cands.join(sh_t, "train_id")
        .join(_maybe_broadcast(sh_e, broadcast_eval), "eval_id")
        .select(
            "train_id",
            "eval_id",
            F.round(
                inter.cast("double") / union.cast("double"), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def fuzzy_contamination_flags(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Per-train-doc rollup of :func:`fuzzy_decontamination_pairs` in
    the ``contamination_flags`` output shape: one row per contaminated
    train doc (clean docs absent — anti-join to scrub), with the match
    count and the strongest eval similarity."""
    pairs = fuzzy_decontamination_pairs(
        train, evalset, id_col=id_col, text_col=text_col, **kwargs
    )
    return pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
    ).select(
        F.col("train_id").alias(id_col), "n_eval_matches", "max_jaccard"
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_groups(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 1
) -> DataFrame:
    """64-bit SimHash per document; identical hashes ⇒ near-identical docs.
    Band the hash into 4×16-bit keys for hamming-distance-≤3 candidate
    search at scale.

    Computed via explode + 64 conditional sums in ONE hash aggregate —
    xxhash64 and the bit votes all run in whole-stage codegen with partial
    (map-side) aggregation, vs the per-row array-aggregate formulation
    (functions/hashing.simhash64) which evaluates 64 interpreted lambda
    folds per document (~25× slower measured).

    The 64 vote aggregates and the 64-way OR fold are built as parsed
    SQL strings (one ``F.expr`` per aggregate, ONE for the whole fold)
    rather than Column-method chains: the chain form issued ~900 py4j
    round-trips per call (~0.7 s of driver time per bench repeat,
    measured r13 — the fastlit.py lesson applied to expression trees).
    ``shiftleft(1L, b)`` reproduces the old mask exactly, including
    b=63 → min-long.
    """
    sh = word_shingles(text_col, n=shingle_n)
    tok = df.select(F.col(id_col), F.explode(sh).alias("__s")).withColumn(
        "__h", F.xxhash64("__s")
    )

    def mask_sql(b: int) -> str:
        return f"shiftleft(CAST(1 AS BIGINT), {b})"

    votes = tok.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN (__h & {mask_sql(b)}) != 0"
                f" THEN 1 ELSE -1 END) AS v{b}"
            )
            for b in range(64)
        ]
    )
    sim = F.expr(
        " | ".join(
            f"(CASE WHEN v{b} > 0 THEN {mask_sql(b)}"
            f" ELSE CAST(0 AS BIGINT) END)"
            for b in range(64)
        )
    )
    out = votes.select(F.col(id_col), sim.alias("simhash"))
    # docs with no tokens fall out of the groupBy: rejoin with simhash 0
    # (the empty-fold value of the per-row formulation)
    out = (
        df.select(id_col)
        .join(out, id_col, "left")
        .withColumn("simhash", F.coalesce("simhash", F.lit(0).cast("long")))
    )
    return out.select(
        F.col(id_col),
        "simhash",
        *[
            F.shiftrightunsigned("simhash", 16 * i)
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"band{i}")
            for i in range(4)
        ],
    )


def simhash_groups_portable(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 1
) -> DataFrame:
    """Engine-portable SimHash: the q32 plan (explode → bit votes in ONE
    codegen'd hash aggregate → band keys) with the Spark-specific
    xxhash64 swapped for the md5-derived 60-bit hash
    (functions/hashing.hash60) — exact integer arithmetic any engine
    reproduces, so the hamming-bucket path gets a DuckDB hash oracle
    (the q22/q25 portability move). 60 bits band into 4×15-bit keys;
    identical band ⇒ hamming candidates, same recall geometry as the
    64-bit/4×16 variant. Token-less docs keep simhash 0 (the empty-fold
    value), like ``simhash_groups``.
    """
    from nahuatl_data_pipeline_spark.functions.hashing import (
        SIMHASH_PORTABLE_BITS,
        hash60,
        word_shingles,
    )

    bits = SIMHASH_PORTABLE_BITS
    sh = word_shingles(text_col, n=shingle_n)
    tok = df.select(F.col(id_col), F.explode(sh).alias("__s")).withColumn(
        "__h", hash60("__s")
    )
    # Parsed-SQL vote/fold construction, same py4j-round-trip rationale
    # as simhash_groups above (values bit-identical: shiftright + &1 on
    # a 60-bit non-negative hash, masks ≤ 1<<59 all fit BIGINT).
    votes = tok.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(__h, {b}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS v{b}"
            )
            for b in range(bits)
        ]
    )
    sim = F.expr(
        " | ".join(
            f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            for b in range(bits)
        )
    )
    out = votes.select(F.col(id_col), sim.alias("simhash"))
    out = (
        df.select(id_col)
        .join(out, id_col, "left")
        .withColumn("simhash", F.coalesce("simhash", F.lit(0).cast("long")))
    )
    band_bits = bits // 4
    return out.select(
        F.col(id_col),
        "simhash",
        *[
            F.shiftright("simhash", band_bits * i)
            .bitwiseAND(F.lit((1 << band_bits) - 1))
            .alias(f"band{i}")
            for i in range(4)
        ],
    )


def prefix_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    prefix_tokens: int = 8,
    containment_threshold: float = 0.8,
) -> DataFrame:
    """Containment near-dup pairs: ``|A∩B| / min(|A|,|B|)`` over n-gram
    shingle sets — the asymmetric signal Jaccard structurally misses. A
    short document fully embedded in a long one (truncated re-crawl,
    quote-with-commentary, boilerplate-wrapped article) has containment
    1.0 but Jaccard ≈ |A|/|B| → far below any Jaccard threshold, so
    ``ngram_jaccard_pairs`` never surfaces it.

    Candidate generation buckets on the min-hashed shingle of the first
    ``prefix_tokens`` tokens: two documents sharing their opening token
    run — the dominant containment mode in crawl data, where the copy
    starts at the original's start — collide with certainty, and the
    hash spreads bucket sizes uniformly (same argument as
    ``ngram_jaccard_pairs``). Mid-document containment needs multi-probe
    keys (every b-th shingle) at b× key volume; this single-probe prefix
    key is the recall/cost point chosen here, and the exact containment
    verify on candidates makes precision 1.0 regardless.

    Scale shape mirrors ``ngram_jaccard_pairs``: shingle once (Arrow
    pandas_udf), persist, bucket self-join on the prefix key, exact
    verify — work is Σ bucket² over hash-spread buckets, never n².
    """
    from nahuatl_data_pipeline_spark.functions.hashing import hash64
    from nahuatl_data_pipeline_spark.operators.tfidf import term_array

    release_fuzzy_caches()  # BEFORE persisting (see ordering contract)
    # the canonical tokenizer (tfidf.term_array) — NOT a fresh split
    # expression, so the prefix cut can never drift from the corpus view
    toks = F.filter(term_array(text_col), lambda t: t != "")
    prefix = F.array_join(F.slice(toks, 1, prefix_tokens), " ")
    key = F.array_min(
        F.transform(word_shingles(prefix, n=shingle_n), hash64)
    )
    # spread a narrow input before the two shingling pandas_udfs (the
    # _signature_bands pattern; no-op at >= defaultParallelism splits)
    df = spread_narrow(df)
    # NOTE (r14, verdict task #4 attempted and REVERTED with plan
    # evidence): hash-partitioning this frame by __key before the
    # persist — so the self-join legs could inherit the partitioning
    # and skip their two payload exchanges — does NOT work on Spark 4:
    # the persisted subtree is wrapped in its own AdaptiveSparkPlan and
    # InMemoryTableScan exposes no hashpartitioning to the outer join,
    # so EnsureRequirements re-adds both leg exchanges ANYWAY (see
    # plans/r14/q106scale_{before,after-attempt}.txt — identical
    # Exchange(21)/(26) above both cache reads), while the extra
    # pre-cache exchange cost +40% local wall. The da46f74 collect_list
    # fold is also wrong here: q106 has no bucket cap, so folding would
    # buffer unbounded shingle-array buckets in one aggregation buffer.
    docs = (
        df.select(
            F.col(id_col).alias("__id"),
            word_shingles(text_col, n=shingle_n).alias("__sh"),
            key.alias("__key"),
        )
        .filter((F.size("__sh") > 0) & F.col("__key").isNotNull())
        .persist()
    )
    docs.count()  # eager: both self-join legs read the cache
    a = docs.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"), "__key"
    )
    b = docs.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"), "__key"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    smaller = F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
    out = (
        a.join(b, "__key")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("containment", inter / smaller)
        .filter(F.col("containment") >= containment_threshold)
        .select(
            "id_a", "id_b", F.round("containment", 6).alias("containment")
        )
    )
    _register_caches(docs)
    return out
