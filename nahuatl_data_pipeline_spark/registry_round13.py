"""Round-13 registrations.

- q173: DPO-pair consolidation report (round-12 verdict #6). The
  reference's ``consolidation_report.json`` / ``dpo_analysis_report.json``
  surface (``kaggle_dpo_script.py`` output: per-dataset DPO pair counts,
  unified dedup ``dpo_total_loaded`` → ``dpo_unified_unique``, and
  chosen/rejected quality-score statistics incl. the ``differences``
  block) was previously covered only by shape-analogy (q11 dup stats /
  q14 top-k). This registers the real composed semantics: a
  deterministic DPO-shaped table synthesized from ``documents``
  (planted duplicate families so the dedup actually bites), global
  keep-best dedup on the (prompt, chosen, rejected) key — the D3
  contract (`operators/dedup.py:exact_dedup`, rank-1 window ordered by
  chosen_score DESC with pair_id tiebreak) — then a per-source report:
  kept-pair count, duplicates removed (families are attributed to their
  WINNER's source, the consolidation-report convention), mean/min/max
  chosen-rejected score delta and mean prompt length.

- q174: the composed URL head stages WITH the PSL cap key — the exact
  configuration the round-13 decade rows and ``curate --psl-file``
  execute. q171 certifies ``url_domain_psl`` in isolation, q172 the
  head windows with the literal-tuple key; q174 closes the composition
  gap. Its oracle is assembled ENTIRELY from shared builders
  (``_CANON_CTES``, ``url_dedup_ctes``, ``psl_oracle_ctes``,
  ``cap_select_sql``, ``host_strip_sql``) so no mirror fragment can
  drift from the queries that certify the pieces.

Kept SMALL (2 entries): round 13 must let the 23-query r09-stale tail
(q107, q109–q124, q157–q162) rotate through the 50-slot certification
window (round-12 verdict #1) — 2 new + 23 stale leaves 25 slots of
younger rounds, clearing the union staleness floor to r10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.registry import register
from nahuatl_data_pipeline_spark.schemas import load_table

# ---------------------------------------------------------------------------
# q173: DPO-pair consolidation (dedup + per-source score-delta report)
# ---------------------------------------------------------------------------

# Family id of the planted duplicate slice: every doc with
# doc_id % 11 == 0 draws its pair text from doc_id % 13 instead of
# doc_id, so ids congruent mod lcm(11,13)=143 collide into one
# byte-identical (prompt, chosen, rejected) family — guaranteed
# collisions from sf0.01 up (ids span ≥ 0..400), with per-row scores
# that still differ (scores derive from doc_id), so keep-best has real
# work to do.
_DUP_MOD = 11
_FAM_MOD = 13


def _q173_sql() -> str:
    return f"""
    WITH pairs AS (
      SELECT doc_id AS pair_id, source,
             'p' || CAST(fid AS VARCHAR) || ' prompt'   AS prompt,
             'c' || CAST(fid AS VARCHAR) || ' chosen'   AS chosen,
             'r' || CAST(fid AS VARCHAR) || ' rejected' AS rejected,
             ROUND(5.0 + (doc_id % 40) / 10.0, 1) AS chosen_score,
             ROUND(1.0 + (doc_id % 35) / 10.0, 1) AS rejected_score
      FROM (
        SELECT *,
               CASE WHEN doc_id % {_DUP_MOD} = 0
                    THEN doc_id % {_FAM_MOD} ELSE doc_id END AS fid
        FROM documents
      )
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY prompt, chosen, rejected
               ORDER BY chosen_score DESC, pair_id ASC) AS rn,
             COUNT(*) OVER (
               PARTITION BY prompt, chosen, rejected) AS fam
      FROM pairs
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(fam - 1) AS BIGINT) AS dups_removed,
           ROUND(AVG(chosen_score - rejected_score), 4) AS mean_delta,
           ROUND(MIN(chosen_score - rejected_score), 4) AS min_delta,
           ROUND(MAX(chosen_score - rejected_score), 4) AS max_delta,
           ROUND(AVG(LENGTH(prompt)), 4) AS mean_prompt_len
    FROM ranked WHERE rn = 1
    GROUP BY source
"""


@register("q173_dpo_consolidation", _q173_sql())
def q173_dpo_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO-pair consolidation: global keep-best dedup on the
    (prompt, chosen, rejected) key + per-source score-delta report —
    the reference's consolidation_report.json ("train_duplicados_
    eliminados"/"dpo_unified_unique") and dpo_analysis_report.json
    ("quality_scores.differences", "text_lengths.prompts") surface
    (kaggle_dpo_script.py:51-118 produces the pairs; the reports are
    its committed outputs), re-expressed as ONE window shuffle + one
    partial agg. The window is the D3 keep-best contract
    (operators/dedup.py:73): rank-1 per key by chosen_score DESC,
    pair_id tiebreak; family sizes ride the same window partition
    (no second shuffle), and dups are attributed to the winner's
    source. Scale: shuffle keys are pair-content bytes, families are
    crawl-duplicate-sized — the same posture as q10/q11 exact dedup."""
    d = F.col("doc_id")
    fid = F.when(d % _DUP_MOD == 0, d % _FAM_MOD).otherwise(d)
    pairs = load_table(spark, sf_dir, "documents").select(
        d.alias("pair_id"),
        "source",
        F.concat(F.lit("p"), fid.cast("string"), F.lit(" prompt")).alias(
            "prompt"
        ),
        F.concat(F.lit("c"), fid.cast("string"), F.lit(" chosen")).alias(
            "chosen"
        ),
        F.concat(F.lit("r"), fid.cast("string"), F.lit(" rejected")).alias(
            "rejected"
        ),
        F.round(5.0 + (d % 40) / 10.0, 1).alias("chosen_score"),
        F.round(1.0 + (d % 35) / 10.0, 1).alias("rejected_score"),
    )
    key = ["prompt", "chosen", "rejected"]
    w = Window.partitionBy(*key).orderBy(
        F.col("chosen_score").desc(), F.col("pair_id").asc()
    )
    fam_w = Window.partitionBy(*key)
    kept = (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn("fam", F.count(F.lit(1)).over(fam_w))
        .filter(F.col("rn") == 1)
    )
    delta = F.col("chosen_score") - F.col("rejected_score")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("fam") - 1).cast("long").alias("dups_removed"),
        F.round(F.avg(delta), 4).alias("mean_delta"),
        F.round(F.min(delta), 4).alias("min_delta"),
        F.round(F.max(delta), 4).alias("max_delta"),
        F.round(F.avg(F.length("prompt")), 4).alias("mean_prompt_len"),
    )


# ---------------------------------------------------------------------------
# q174: composed URL head stages WITH the PSL cap key (the round-13
# decade-row configuration, hash-certified)
# ---------------------------------------------------------------------------

_Q174_CAP = 2  # small enough to bite on q171's per-domain families at sf0.01


def _q174_sql() -> str:
    """DuckDB mirror of url_head_stages(psl_rules=...) over q171's URL
    table: canonicalization via the shared _CANON_CTES, dedup + cap
    windows via the shared url_dedup_ctes/cap_select_sql builders (one
    definition with q172), host extraction via registry.host_strip_sql,
    and the registered domain via the shared psl_oracle_ctes PSL-
    algorithm mirror (one definition with q171) — every fragment of
    this oracle is a shared builder; q174 itself only composes them,
    which is exactly what it certifies about the engine side."""
    from nahuatl_data_pipeline_spark.registry import host_strip_sql
    from nahuatl_data_pipeline_spark.registry_round9 import _CANON_CTES
    from nahuatl_data_pipeline_spark.registry_round12 import (
        _Q171_RULES,
        _q171_urls_sql,
        cap_select_sql,
        psl_oracle_ctes,
        url_dedup_ctes,
    )

    return f"""
    WITH urls AS (
      SELECT doc_id, 0 AS n_chars, url FROM ({_q171_urls_sql()})
    ),
    {_CANON_CTES},
    {url_dedup_ctes()},
    hosts AS (
      SELECT doc_id, url,
             {host_strip_sql("canonical_url")} AS host
      FROM dedup
    ),
    {psl_oracle_ctes(_Q171_RULES)}
    {cap_select_sql(_Q174_CAP)}
"""


@register("q174_url_head_psl_survivors", _q174_sql())
def q174_url_head_psl_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl head block WITH the PSL cap key
    (plans/curation_pipeline.py:url_head_stages(psl_rules=...) — the
    exact configuration the round-13 PSL decade rows and
    `curate --psl-file` execute), certified row-for-row. q171 certifies
    url_domain_psl in isolation and q172 certifies the head windows
    with the literal-tuple key; this closes the remaining gap — the
    COMPOSITION: canonical-key dedup feeding broadcast-only PSL domain
    extraction feeding the md5-ordered per-domain cap, junk rows (NULL
    urls planted by q171's table) passing both windows on per-row keys,
    hosts that ARE a public suffix (a.b{k}.ck under *.ck) yielding NULL
    domains and therefore exempt from the cap (the documented PSL
    nuance), IPv4 literals capped as their own domains. Still two
    window shuffles keyed on bytes of URL; the PSL joins add zero
    exchanges (q171/plan-asserted)."""
    from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
        url_head_stages,
    )
    from nahuatl_data_pipeline_spark.registry_round12 import (
        _Q171_RULES,
        _q171_url_table,
    )

    urls = _q171_url_table(spark, sf_dir).select("doc_id", "url")
    rules = {k: list(v) for k, v in _Q171_RULES.items()}
    out, _, _ = url_head_stages(
        urls,
        "url",
        F.col("doc_id"),
        max_docs_per_domain=_Q174_CAP,
        psl_rules=rules,
    )
    return out.select("doc_id", "url")
