"""Gold-standard corpus audit (reference ``scripts/analyze_gold_standard.py``).

The reference audits the final SFT parquet driver-side with pandas:
volumetry, schema compatibility, null/empty counts, exact + source-side
duplicate rates, char-length distribution, a "junk" short-target count,
a 5-row eyeball sample, and a scored verdict written to
``gold_standard_report.md`` (``analyze_gold_standard.py:24-108``).

Spark-first re-expression: every scalar the narrative needs comes from
ONE aggregate pass over the table (the multi-count-distinct expands via
Spark's EXPAND operator — still a single scan), the eyeball sample is a
deterministic content-hash top-k (reproducible across runs and engines,
unlike ``df.sample``), and the verdict/markdown rendering is driver-side
string work over that 1-row result — so the same audit runs unchanged on
a 100 TB gold table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AuditResult:
    metrics: dict
    sample: list[dict]
    score: int
    verdict: str


def _pick_columns(df: DataFrame) -> tuple[str, str, bool]:
    """The reference's schema cascade (:36-52): es/nah, then
    input/output, else the first two columns; second element of the
    return is whether the schema is SFT-standard."""
    cols = df.columns
    if "es" in cols and "nah" in cols:
        return "es", "nah", True
    if "input" in cols and "output" in cols:
        return "input", "output", True
    if len(cols) < 2:
        raise ValueError("audit needs at least two columns")
    return cols[0], cols[1], False


def audit_metrics_frame(df: DataFrame, src: str, tgt: str) -> DataFrame:
    """All audit scalars as ONE 1-row DataFrame (single aggregate pass)
    — the distributed surface behind :func:`audit_metrics`, registered
    as a certified query (q162). Exact duplicate count = rows − distinct
    full rows; source-duplicate (ambiguity) count = rows − distinct
    sources — the pandas ``duplicated().sum()`` semantics (:64-67)
    without materializing a driver copy. Distinct sources are counted
    over a null-INCLUSIVE key (``countDistinct`` skips NULLs, but
    pandas treats NaN==NaN in ``duplicated``, so k null sources must
    count as ONE distinct value → k−1 duplicates); the full-row
    distinct needs no such guard because ``struct()`` of null fields is
    itself non-null."""
    all_cols = [F.col(c) for c in df.columns]
    agg = df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        sum(
            (F.count(F.lit(1)) - F.count(F.col(c))) for c in df.columns
        ).alias("null_values"),
        F.count(F.when(F.trim(F.col(src).cast("string")) == "", 1)).alias(
            "empty_source"
        ),
        F.count(F.when(F.trim(F.col(tgt).cast("string")) == "", 1)).alias(
            "empty_target"
        ),
        F.countDistinct(F.struct(*all_cols)).alias("__distinct_rows"),
        (
            F.countDistinct(F.col(src))
            + F.coalesce(
                F.max(F.when(F.col(src).isNull(), 1).otherwise(0)), F.lit(0)
            )
        ).alias("__distinct_src"),
        F.round(F.avg(F.length(F.col(src))), 1).alias("src_len_avg"),
        F.max(F.length(F.col(src))).alias("src_len_max"),
        F.min(F.length(F.col(src))).alias("src_len_min"),
        F.round(F.avg(F.length(F.col(tgt))), 1).alias("tgt_len_avg"),
        F.max(F.length(F.col(tgt))).alias("tgt_len_max"),
        F.min(F.length(F.col(tgt))).alias("tgt_len_min"),
        F.count(F.when(F.length(F.col(tgt)) < 10, 1)).alias(
            "short_targets"
        ),
    )
    keep = [c for c in agg.columns if not c.startswith("__")]
    return agg.select(
        *keep,
        (F.col("total_rows") - F.col("__distinct_rows")).alias(
            "exact_duplicates"
        ),
        (F.col("total_rows") - F.col("__distinct_src")).alias(
            "source_duplicates"
        ),
    )


def audit_metrics(df: DataFrame, src: str, tgt: str) -> dict:
    """Driver-side dict of :func:`audit_metrics_frame`'s single row."""
    return audit_metrics_frame(df, src, tgt).collect()[0].asDict()


def audit_sample(df: DataFrame, src: str, tgt: str, k: int = 5) -> list[dict]:
    """Deterministic eyeball sample: md5-of-content order, first ``k``
    (TakeOrderedAndProject — per-task heaps, driver merges k·P rows).
    The reference's ``df.sample(5)`` is nondeterministic; a CI artifact
    wants the same 5 rows per input."""
    key = F.md5(
        F.concat_ws(
            "\x1f",
            F.coalesce(F.col(src).cast("string"), F.lit("")),
            F.coalesce(F.col(tgt).cast("string"), F.lit("")),
        )
    )
    rows = (
        df.select(
            F.col(src).cast("string").alias("source"),
            F.col(tgt).cast("string").alias("target"),
            key.alias("__k"),
        )
        .orderBy("__k")
        .limit(k)
        .collect()
    )
    return [{"source": r["source"], "target": r["target"]} for r in rows]


def audit_score(m: dict, min_rows: int = 10_000) -> tuple[int, str]:
    """The reference's scored verdict (:90-104), same deductions."""
    score = 100
    if m["total_rows"] < min_rows:
        score -= 30
    if m["null_values"] > 0:
        score -= 10
    if m["exact_duplicates"] > 500:
        score -= 10
    if m["source_duplicates"] > 2000:
        score -= 10
    if m["short_targets"] > 1000:
        score -= 10
    if score >= 80:
        verdict = "PASS"
    elif score >= 60:
        verdict = "PASS_WITH_RESERVATIONS"
    else:
        verdict = "FAIL"
    return score, verdict


def audit_gold_standard(
    df: DataFrame, min_rows: int = 10_000, sample_k: int = 5
) -> AuditResult:
    src, tgt, standard = _pick_columns(df)
    m = audit_metrics(df, src, tgt)
    m["source_col"] = src
    m["target_col"] = tgt
    m["schema_standard"] = standard
    score, verdict = audit_score(m, min_rows=min_rows)
    return AuditResult(
        metrics=m,
        sample=audit_sample(df, src, tgt, k=sample_k),
        score=score,
        verdict=verdict,
    )


def render_audit_markdown(result: AuditResult, source_path: str = "") -> str:
    """The ``gold_standard_report.md`` artifact, one section per
    narrative block of the reference script."""
    m = result.metrics
    pct = lambda n: f"{n / m['total_rows']:.1%}" if m["total_rows"] else "n/a"
    lines = [
        f"# Gold-standard audit{': ' + source_path if source_path else ''}",
        "",
        f"**Verdict: {result.verdict} — score {result.score}/100**",
        "",
        "## Volumetry & schema",
        f"- total rows: {m['total_rows']:,}",
        f"- audited columns: {m['source_col']} → {m['target_col']}"
        + (" (SFT-standard)" if m["schema_standard"] else " (NON-standard schema)"),
        "",
        "## Data quality",
        f"- null values (all columns): {m['null_values']}",
        f"- empty source: {m['empty_source']}  |  empty target: {m['empty_target']}",
        f"- exact duplicate rows: {m['exact_duplicates']} ({pct(m['exact_duplicates'])})",
        f"- repeated sources (ambiguity): {m['source_duplicates']} ({pct(m['source_duplicates'])})",
        "",
        "## Length distribution (chars)",
        f"- source: avg={m['src_len_avg']} max={m['src_len_max']} min={m['src_len_min']}",
        f"- target: avg={m['tgt_len_avg']} max={m['tgt_len_max']} min={m['tgt_len_min']}",
        f"- junk targets (<10 chars): {m['short_targets']:,}",
        "",
        "## Deterministic sample",
    ]
    for row in result.sample:
        s = (row["source"] or "")[:80]
        t = (row["target"] or "")[:80]
        lines += [f"- `{s}` → `{t}`"]
    return "\n".join(lines) + "\n"
