"""Char-heuristic language identification (reference
``src/transforms/normalizers.py:298-346``).

Pure Spark expression cascade — no model, no UDF — so LID over 100 TB is a
codegen'd scan. The fastText-model variant (``pipeline/processing/lid.py``)
is the pluggable slow path; see ``operators/multimodal.py`` for the
broadcast-model pandas_udf pattern it would use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _count_matches(c: Column, pattern_char_len: int, pattern: str) -> Column:
    """Occurrences of a fixed-length literal via the length-diff trick
    (keeps the whole cascade in codegen; no explode)."""
    return (
        F.length(c) - F.length(F.regexp_replace(c, pattern, ""))
    ) / pattern_char_len


def detect_language(c: Column | str) -> Column:
    """Heuristic LID: macrons ⇒ nah; Náhuatl digraphs (tl/tz/kw/ku) ⇒ nah;
    Maya ejectives (k' ch' t' p' ts' ʔ) ⇒ myn; ¿ ¡ ñ ⇒ es; else NULL.

    Mirrors normalizers.py:298-346 ordering (macron test first — it is the
    strongest signal and must not be shadowed by the es test).
    """
    col = F.col(c) if isinstance(c, str) else c
    low = F.lower(col)

    nah_digraphs = (
        _count_matches(low, 2, "tl")
        + _count_matches(low, 2, "tz")
        + _count_matches(low, 2, "kw")
        + _count_matches(low, 2, "ku")
    )
    maya_marks = (
        _count_matches(low, 2, "k'")
        + _count_matches(low, 3, "ch'")
        + _count_matches(low, 2, "t'")
        + _count_matches(low, 2, "p'")
        + _count_matches(low, 3, "ts'")
        + _count_matches(low, 1, "ʔ")
    )

    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(low.rlike("[āēīōū]"), F.lit("nah"))
        .when(nah_digraphs >= 1, F.lit("nah"))
        .when(maya_marks >= 1, F.lit("myn"))
        .when(low.rlike("[¿¡ñ]"), F.lit("es"))
        .otherwise(F.lit(None).cast("string"))
    )
