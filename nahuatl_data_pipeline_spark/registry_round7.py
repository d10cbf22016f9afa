"""Round-7 registry extension: two beyond-reference training-data
selection operators — DSIR importance weighting (q138) and
margin-based bitext-style neighbor mining (q139). Both fully
oracle-checked; plan contracts asserted in the global plan sweep."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.registry import register
from nahuatl_data_pipeline_spark.schemas import load_table

# ---------------------------------------------------------------------------
# q138: DSIR hashed-n-gram importance log-weights
# ---------------------------------------------------------------------------

_Q138_TARGET_SOURCES = "('src0', 'src1')"

_Q138_SQL = f"""
    WITH toks AS (
      SELECT doc_id, source,
             LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ),
    bags AS (
      SELECT doc_id, source,
             LIST_TRANSFORM(RANGE(1, LEN(tk)),
                            i -> ARRAY_TO_STRING(tk[i:i+1], ' ')) AS gs
      FROM toks WHERE LEN(tk) >= 2
    ),
    occ AS (
      SELECT doc_id, source,
             CAST(('0x' || SUBSTRING(MD5(g), 1, 15)) AS BIGINT)
               % 2147483647 % 1024 AS b
      FROM bags, UNNEST(gs) AS u(g)
    ),
    doc_b AS (SELECT doc_id, b, COUNT(*) AS c FROM occ GROUP BY 1, 2),
    raw_b AS (SELECT b, COUNT(*) AS ca FROM occ GROUP BY 1),
    tgt_b AS (
      SELECT b, COUNT(*) AS ct FROM occ
      WHERE source IN {_Q138_TARGET_SOURCES} GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT SUM(ca) FROM raw_b) AS ta,
             (SELECT SUM(ct) FROM tgt_b) AS tt
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           ROUND(SUM(c * (LN(COALESCE(ct, 0) + 1.0) - LN(tt + 1024.0)
                          - LN(ca + 1.0) + LN(ta + 1024.0))), 4)
             AS log_weight
    FROM doc_b
    JOIN raw_b USING (b)
    LEFT JOIN tgt_b USING (b)
    CROSS JOIN tot
    GROUP BY doc_id
"""


@register("q138_dsir_importance", _Q138_SQL)
def q138_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): hashed-bigram
    importance log-weights of every document against a target domain
    (sources src0/src1), add-1-smoothed over 1024 hash buckets. The
    n-gram explode is the only corpus-sized work; bucket tables are
    ≤1024 rows and broadcast (operators/importance.py)."""
    from nahuatl_data_pipeline_spark.operators.importance import (
        dsir_log_weights,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    target = docs.filter(F.col("source").isin("src0", "src1"))
    return dsir_log_weights(
        docs, target, ngram_n=2, n_buckets=1024, round_to=4
    )


# ---------------------------------------------------------------------------
# q139: margin-based neighbor mining (bitext-mining criterion)
# ---------------------------------------------------------------------------

_Q139_SQL = """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROUND(LIST_COSINE_SIMILARITY(
               CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4)
               AS cosine
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.vec_id
    ),
    rq AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r
      FROM scored
    ),
    aq AS (SELECT query_id, AVG(cosine) AS a FROM rq WHERE r <= 4 GROUP BY 1),
    rn AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY neighbor_id ORDER BY cosine DESC, query_id ASC) AS r
      FROM scored
    ),
    an AS (
      SELECT neighbor_id, AVG(cosine) AS a FROM rn WHERE r <= 4 GROUP BY 1
    ),
    m AS (
      SELECT s.query_id, s.neighbor_id, s.cosine,
             ROUND(s.cosine / (0.5 * (aq.a + an.a)), 4) AS margin
      FROM scored s JOIN aq USING (query_id) JOIN an USING (neighbor_id)
    )
    SELECT query_id, neighbor_id, cosine, margin, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY margin DESC, neighbor_id ASC) AS rank
      FROM m
    ) WHERE rank <= 5
"""


@register("q139_margin_topk", _Q139_SQL)
def q139_margin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-corpus mining criterion (Artetxe & Schwenk
    2019): cosine rescaled by both endpoints' top-4 neighborhood
    averages, top-5 per query — the hub-suppressing ranking bitext
    mining uses instead of raw cosine (operators/similarity.margin_topk)."""
    from nahuatl_data_pipeline_spark.operators.similarity import margin_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return margin_topk(
        emb.filter(F.col("vec_id") < 10), emb, k_margin=4, k=5
    ).withColumn("rank", F.col("rank").cast("int"))
