"""End-to-end training-corpus curation pipeline (beyond the reference —
its unify pipeline handles aligned translation pairs; this one curates a
web-scale `documents` corpus the way a pretraining data build does).

One lazy chain:

    redact PII → C4 rules → Gopher repetition → cluster-wise near-dup
    dedup → benchmark decontamination → gold parquet write

Every gate is attached as a BOOLEAN FLAG first and the corpus is
filtered once at the end, so per-rule drop accounting rides the write
job's single pass through an ``Observation`` (conditional counts) —
no per-stage count() re-scans, the same discipline as
``pipeline.run_corpus_pipeline``. The only internal actions are the
connected-components rounds inside cluster dedup (documented there).

Scale shape: PII + C4 are codegen projections (no shuffle); repetition
adds two doc-keyed partial-agg groupBys; dedup is the banded bucket
join + min-label propagation; decontamination broadcasts the (tiny)
eval shingle set. Nothing collects to the driver except the final stats
row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.pii import redact_pii
from nahuatl_data_pipeline_spark.operators.components import duplicate_clusters
from nahuatl_data_pipeline_spark.operators.curation import (
    c4_rule_flags,
    contamination_flags,
    repetition_signals,
)
from nahuatl_data_pipeline_spark.operators.fuzzy_dedup import ngram_jaccard_pairs


@dataclass
class CurationConfig:
    min_words: int = 20
    max_top_bigram_frac: float = 0.18
    max_top_token_frac: float = 0.30
    jaccard_threshold: float = 0.8
    shingle_n: int = 3
    decontam_n: int = 13
    # when set, repeated substring_dedup_n-token passages are removed
    # (globally-first occurrence kept) BEFORE the quality gates — the
    # Lee-et-al. span-dedup stage; case-preserving, span accounting
    # rides the same Observation as every other stage
    substring_dedup_n: int | None = None


def run_curation_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    evalset: DataFrame | None = None,
    cfg: CurationConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Curate ``docs`` into a gold parquet at ``out_dir``; returns the
    per-rule drop accounting.

    A document survives iff it passes C4 AND repetition gates, is the
    canonical member of its near-dup cluster (or in no cluster), and
    shares no ``decontam_n``-gram with ``evalset``. Drops overlap, so
    ``output`` is counted directly rather than derived.
    """
    from pyspark.sql import Observation

    cfg = cfg or CurationConfig()

    redacted = docs.withColumn(text_col, redact_pii(F.col(text_col)))

    if cfg.substring_dedup_n:
        from nahuatl_data_pipeline_spark.operators.substring_dedup import (
            exact_substring_dedup,
        )

        cleaned = exact_substring_dedup(
            redacted,
            id_col,
            text_col,
            n=cfg.substring_dedup_n,
            lowercase=False,  # a REWRITE stage must preserve case
        ).select(
            id_col,
            F.col("cleaned").alias("__cleaned"),
            F.col("n_removed").alias("__sub_removed"),
        )
        # LEFT join: null-text docs carry no tokens and are absent from
        # the dedup output — they keep their null text and fail the C4
        # gate downstream exactly as before. The rewrite substitutes
        # cleaned text ONLY where spans were actually removed: the
        # reassembly is array_join(' '), which would collapse newlines /
        # tabs / runs of spaces in EVERY document, so untouched docs
        # must keep their original bytes.
        order = redacted.columns
        redacted = (
            redacted.join(cleaned, id_col, "left")
            .withColumn(
                text_col,
                F.when(
                    F.col("__sub_removed") > 0, F.col("__cleaned")
                ).otherwise(F.col(text_col)),
            )
            .drop("__cleaned")
            .select(*order, "__sub_removed")
        )
    else:
        redacted = redacted.withColumn("__sub_removed", F.lit(0))

    c4 = c4_rule_flags(
        redacted, id_col, text_col, min_words=cfg.min_words
    ).select(id_col, F.col("keep_doc").alias("__keep_c4"))
    rep = repetition_signals(
        redacted,
        id_col,
        text_col,
        max_top_bigram_frac=cfg.max_top_bigram_frac,
        max_top_token_frac=cfg.max_top_token_frac,
    ).select(id_col, F.col("keep_doc").alias("__keep_rep"))

    pairs = ngram_jaccard_pairs(
        redacted, id_col, text_col,
        shingle_n=cfg.shingle_n, jaccard_threshold=cfg.jaccard_threshold,
    )
    dup = duplicate_clusters(pairs).select(
        F.col("doc_id").alias(id_col),
        (~F.col("is_canonical")).alias("__is_dup"),
    )

    flagged = (
        redacted.join(c4, id_col, "left")
        .join(rep, id_col, "left")
        .join(dup, id_col, "left")
    )
    if evalset is not None:
        contam = contamination_flags(
            redacted, evalset, id_col, text_col, n=cfg.decontam_n
        ).select(id_col, F.lit(True).alias("__is_contam"))
        flagged = flagged.join(F.broadcast(contam), id_col, "left")
    else:
        flagged = flagged.withColumn("__is_contam", F.lit(False))

    # sub-2-token docs have no repetition row: fail the gate, like C4
    keep = (
        F.coalesce(F.col("__keep_c4"), F.lit(False))
        & F.coalesce(F.col("__keep_rep"), F.lit(False))
        & ~F.coalesce(F.col("__is_dup"), F.lit(False))
        & ~F.coalesce(F.col("__is_contam"), F.lit(False))
    )

    def n_failed(c: F.Column) -> F.Column:
        return F.sum(c.cast("long"))

    obs = Observation()
    flagged = flagged.withColumn("__keep", keep).observe(
        obs,
        F.count(F.lit(1)).alias("input"),
        n_failed(~F.coalesce(F.col("__keep_c4"), F.lit(False))).alias("failed_c4"),
        n_failed(~F.coalesce(F.col("__keep_rep"), F.lit(False))).alias(
            "failed_repetition"
        ),
        n_failed(F.coalesce(F.col("__is_dup"), F.lit(False))).alias("near_dups"),
        n_failed(F.coalesce(F.col("__is_contam"), F.lit(False))).alias(
            "contaminated"
        ),
        n_failed(F.col("__keep")).alias("output"),
        F.sum(F.coalesce(F.col("__sub_removed"), F.lit(0))).alias(
            "substring_tokens_removed"
        ),
    )
    (
        flagged.filter(F.col("__keep"))
        .drop(
            "__keep_c4", "__keep_rep", "__is_dup", "__is_contam", "__keep",
            "__sub_removed",
        )
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    try:
        stats = dict(obs.get)
    except Exception:
        # zero-partition degenerate write: no task ran, observation empty
        stats = {
            "input": 0, "failed_c4": 0, "failed_repetition": 0,
            "near_dups": 0, "contaminated": 0, "output": 0,
            "substring_tokens_removed": 0,
        }
    return {k: int(v or 0) for k, v in stats.items()}
