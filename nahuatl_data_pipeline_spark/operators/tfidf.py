"""TF-IDF term scoring over a document corpus.

The reference computes per-corpus token frequency tables driver-side
(benchmark/generate_stats.py:57-80, pandas value_counts); this is the
distributed generalization to tf-idf with per-document top-k terms —
the standard relevance/keyword-extraction primitive a curation
pipeline uses for topic tagging and boilerplate spotting.

Plan shape (all codegen, no Python) — deliberately LINEAR:
  tokenize (split+explode projection)
    → tf: groupBy(doc, term) map-side-combined count      [shuffle 1]
    → df: count window PARTITIONED BY term over the tf
      rows (one row per (doc,term), so the window count
      IS document frequency)                              [shuffle 2]
    → N: 1-row corpus count, crossJoin-broadcast — the
      scalar never touches the driver
    → score = tf * ln((1+N)/(1+df)) (smoothed idf)
    → per-doc top-k via rank window partitioned by doc    [shuffle 3]

The df step is a window, not a groupBy-then-self-join: joining tf back
to an aggregate OF tf duplicates the whole tokenize+aggregate subtree
in the plan (Spark does not reuse the exchange across the two branches
under AQE — measured), so every document would be tokenized twice. The
window consumes tf's output in place: same shuffle-by-term cost, one
tokenize. Three key-partitioned shuffles total; nothing global,
nothing driver-side — the same plan at 100 TB just has more reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_array(text_col: str):
    r"""THE tokenization expression (trim + lowercase + ``\s+`` split)
    shared by every term-level operator (tf-idf here, drift's corpus
    counts) — one definition, so vocabularies cannot drift between
    operators or their SQL oracles."""
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def tokenize(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, token): trim + lowercase + ``\\s+`` split,
    empties dropped — the SAME tokenization contract as the dedup /
    curation operators (functions/hashing.py:token_set), so tf-idf and
    drift vocabularies agree with every other operator's view of the
    corpus. Pure projection + generator — stays in whole-stage
    codegen."""
    return docs.select(
        id_col, F.explode(term_array(text_col)).alias("term")
    ).filter(F.col("term") != "")


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed tf-idf.

    ``score = tf * ln((1 + N) / (1 + df))``, rounded to ``round_to``
    decimals; ties broken by term ascending so the top-k set is fully
    deterministic (required for oracle hashing and for reproducible
    feature extraction).
    """
    toks = tokenize(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    with_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n = docs.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        with_df
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log((1 + F.col("__n")) / (1 + F.col("df"))),
                round_to,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def vocab_growth(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bucket_docs: int = 50,
) -> DataFrame:
    """Vocabulary growth curve (Heaps' law): cumulative distinct-type
    count as the corpus is consumed in ``id_col`` order, reported at
    every ``bucket_docs`` documents. The curve's exponent is the
    standard novelty diagnostic for a training corpus — flat early
    saturation flags template/boilerplate floods and exhausted
    near-duplicate crawls before any model sees the data.

    Plan: cumulative distinct is NOT computed as a running
    count-distinct window (quadratic state). Each type contributes at
    exactly one point — its FIRST document — so: tokenize→explode, one
    min(doc) aggregate keyed by term [the only row-level shuffle],
    bucket the first-occurrence ids, count new types per bucket, then
    a cumulative-sum window over the ~corpus/bucket_docs bucket rows.
    That final window is a single-partition sort ON THE BUCKET TABLE
    (bounded rows — 100 TB at bucket_docs=50 is still only millions of
    rows, and bucket_docs scales up with the corpus), never on the
    token stream.
    """
    from pyspark.sql import Window

    toks = tokenize(docs, id_col, text_col)
    first = toks.groupBy("term").agg(F.min(id_col).alias("__first"))
    buckets = (
        first.groupBy(
            F.floor(F.col("__first") / bucket_docs).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return buckets.select(
        F.col("bucket").cast("long").alias("bucket"),
        ((F.col("bucket") + 1) * bucket_docs).cast("long").alias("docs_seen"),
        "new_types",
        F.sum("new_types").over(w).cast("long").alias("cum_types"),
    )
