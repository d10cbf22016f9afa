"""Round-11 registrations.

- q167: portable HyperLogLog register grid (operators/sketches.py:
  hll_registers) — the oracle-certified twin of q63's built-in
  approx_count_distinct, exactly the q163/CMS/minwise move: a fixed
  md5-derived register grid (low p bits pick the register, leading
  zeros of the remaining 60−p bits rank it, cell-wise MAX merge) whose
  every register the DuckDB oracle recomputes bit-for-bit. The derived
  floating estimate (hll_estimate) is NOT certified — the
  within-rsd-of-exact and agrees-with-built-in invariants live in
  tests/test_sketches.py. With this twin, the ``no_oracle`` algorithms
  lacking any hash-certified formulation drop to q44/q45/q56/q57 + the
  two seeded pyspark.ml paths.

Kept deliberately SHORT (1 entry): round 11 must let the r07-stale
q141–q156 block rotate through the 50-slot certification window
(round-10 verdict #3) — 1 new + 1 recertify-pinned (q164) + 16 r07 +
32 oldest-r08 fills it exactly, clearing the union staleness floor to
r08.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.registry import register
from nahuatl_data_pipeline_spark.schemas import load_table

# ---------------------------------------------------------------------------
# q167: portable HLL register grid
# ---------------------------------------------------------------------------

_Q167_P = 9  # m = 512 registers; tail = 60 - 9 = 51 bits, rho_max = 52

# DuckDB mirror of sketches.py:hll_registers over q63's tokenization
# (lowercased whitespace tokens of documents.text, per lang): the same
# hash60 ('0x' || first-15-md5-hex-chars as int64), the same % / >>
# bit split, and bit_length via LENGTH(TO_BASE(w, 2)) — Spark's
# LENGTH(CONV(w, 10, 2)) twin. Pure integer arithmetic end to end.
_Q167_SQL = rf"""
    WITH tok AS (
      SELECT lang,
             UNNEST(LIST_FILTER(
               REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'),
               t -> t <> '')) AS token
      FROM documents
    ),
    h AS (
      SELECT lang,
             CAST(('0x' || SUBSTRING(MD5(token), 1, 15)) AS BIGINT) AS h
      FROM tok
    )
    SELECT lang,
           CAST(h % {1 << _Q167_P} AS BIGINT) AS register,
           CAST(MAX(CASE WHEN (h >> {_Q167_P}) = 0 THEN {60 - _Q167_P + 1}
                         ELSE {60 - _Q167_P + 1}
                              - LENGTH(TO_BASE(h >> {_Q167_P}, 2))
                    END) AS BIGINT) AS max_rho
    FROM h
    GROUP BY lang, register
"""


@register("q167_hll_portable", _Q167_SQL)
def q167_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HLL register grid per language over the q63 token
    stream (operators/sketches.py:hll_registers, p=9 → 512 registers).
    ONE map-side-combined aggregate: each task folds into ≤ m partial
    maxima, the shuffle carries ≤ m rows per task at any corpus size,
    and disjoint parts merge by cell-wise MAX — the 100 TB cardinality
    primitive, here in the md5-portable form whose every register the
    oracle recomputes (q63's built-in registers are engine-internal,
    error-bound-checkable only)."""
    from nahuatl_data_pipeline_spark.operators.sketches import hll_registers

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("token"),
    )
    return hll_registers(tok, "token", p=_Q167_P, group_cols=("lang",))
