"""Round-10 registrations.

- q163: portable SimHash (operators/fuzzy_dedup.py:
  simhash_groups_portable) — the q32 bit-vote plan over the md5-derived
  60-bit hash instead of Spark's xxhash64, which makes the
  hamming-bucket near-dup path DuckDB-hashable (the q22/q25 portability
  move) and shrinks the ``no_oracle`` set to 7. q32 (the xxhash64
  production variant — one JVM hash call per shingle vs md5+hex-parse)
  stays registered; a parity unit asserts both variants agree on
  neighbor structure at the same hamming radius.

Kept deliberately SHORT: the driver certifies only the first 50
``queries()`` entries per round and round 10 must let the r06-stale
q125–q137 block (plus the oldest r07 entries) rotate through the
window (round-9 verdict #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nahuatl_data_pipeline_spark.functions.hashing import (
    SIMHASH_PORTABLE_BITS,
)
from nahuatl_data_pipeline_spark.registry import register
from nahuatl_data_pipeline_spark.schemas import load_table

# ---------------------------------------------------------------------------
# q163: portable SimHash fingerprints + hamming bands
# ---------------------------------------------------------------------------

# DuckDB mirror of simhash_groups_portable at shingle_n=1: distinct
# lowercase ASCII-\s tokens → 60-bit md5 hash → per-bit ±1 votes (ONE
# grouped aggregate over an unnested bit index, the set-based dual of
# the Spark plan's 60 pivoted vote columns) → majority bits OR'd into
# the fingerprint → 4×15-bit band keys. Strict majority (> 0) on both
# sides; token-less docs keep simhash 0 via the LEFT JOIN.
_BAND_BITS = SIMHASH_PORTABLE_BITS // 4
_Q163_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(LIST_FILTER(
               REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
               t -> t <> ''))) AS tok
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CAST(('0x' || SUBSTRING(MD5(tok), 1, 15)) AS BIGINT) AS hv
      FROM toks
    ),
    bits AS (
      SELECT doc_id, b,
             CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END AS v
      FROM h CROSS JOIN (SELECT UNNEST(RANGE(0, {SIMHASH_PORTABLE_BITS})) AS b)
    ),
    votes AS (SELECT doc_id, b, SUM(v) AS sv FROM bits GROUP BY 1, 2),
    sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN sv > 0 THEN (CAST(1 AS BIGINT) << b)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.simhash, 0) AS simhash,
           (COALESCE(s.simhash, 0) >> {0 * _BAND_BITS})
             & {(1 << _BAND_BITS) - 1} AS band0,
           (COALESCE(s.simhash, 0) >> {1 * _BAND_BITS})
             & {(1 << _BAND_BITS) - 1} AS band1,
           (COALESCE(s.simhash, 0) >> {2 * _BAND_BITS})
             & {(1 << _BAND_BITS) - 1} AS band2,
           (COALESCE(s.simhash, 0) >> {3 * _BAND_BITS})
             & {(1 << _BAND_BITS) - 1} AS band3
    FROM documents d LEFT JOIN sim s USING (doc_id)
"""


@register("q163_simhash_portable", _Q163_SQL)
def q163_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable SimHash fingerprints + 15-bit hamming bands
    (operators/fuzzy_dedup.py:simhash_groups_portable): q32's bit-vote
    aggregate over the engine-portable 60-bit md5 hash, so the whole
    hamming-bucket near-dup scheme is hash-certified against DuckDB."""
    from nahuatl_data_pipeline_spark.operators.fuzzy_dedup import (
        simhash_groups_portable,
    )

    docs = load_table(spark, sf_dir, "documents")
    return simhash_groups_portable(docs, "doc_id", "text")
