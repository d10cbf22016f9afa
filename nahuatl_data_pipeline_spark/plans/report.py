"""Dataset card generator — the one-call corpus summary every dataset
release ships: sizes, token distribution, source mix, duplication, all
from the repo's existing operators, assembled into a plain dict.

Job budget is deliberate: ONE corpus-wide aggregate computes every
scalar and distribution stat (doc counts, token moments, exact-dup
rate via distinct text hashes, approx percentiles), one count shuffle
feeds the source mix (top-N + OTHER and HHI/entropy run on its
key-cardinality output), and nothing else touches the corpus. All
collects are constant-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dataset_report(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    top_sources: int = 5,
) -> dict:
    """Summary dict: ``n_docs``, ``n_sources``, ``null_text_docs``,
    ``total_tokens``, ``mean_tokens``, ``p50_tokens``, ``p90_tokens``,
    ``exact_dup_rate`` (1 − |distinct text hashes| / non-null docs),
    ``source_mix`` (top-N list of {source, n_docs, share} + OTHER),
    ``source_hhi``, ``source_entropy``."""
    from nahuatl_data_pipeline_spark.operators.mixing import (
        mix_concentration,
    )
    from nahuatl_data_pipeline_spark.operators.pivot import topn_other

    toks = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
    )
    base = docs.select(
        F.col(id_col),
        F.col(source_col).alias("__src"),
        F.when(F.col(text_col).isNotNull(), toks).alias("__nt"),
        F.when(
            F.col(text_col).isNotNull(), F.md5(F.col(text_col))
        ).alias("__th"),
    )
    row = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__src").alias("n_sources"),
        F.coalesce(
            F.sum(F.col("__th").isNull().cast("long")), F.lit(0)
        ).alias("null_text_docs"),
        F.coalesce(F.sum("__nt"), F.lit(0)).alias("total_tokens"),
        F.round(F.avg("__nt"), 2).alias("mean_tokens"),
        F.percentile_approx("__nt", 0.5, 1000).alias("p50_tokens"),
        F.percentile_approx("__nt", 0.9, 1000).alias("p90_tokens"),
        F.countDistinct("__th").alias("__distinct_texts"),
    ).collect()[0]
    non_null = row["n_docs"] - row["null_text_docs"]
    dup_rate = (
        round(1.0 - row["__distinct_texts"] / non_null, 6)
        if non_null
        else 0.0
    )

    mix_rows = topn_other(base, "__src", n=top_sources).collect()
    total = sum(r["total"] for r in mix_rows) or 1
    mix = sorted(
        (
            {
                "source": r["label"],
                "n_docs": r["total"],
                "share": round(r["total"] / total, 6),
            }
            for r in mix_rows
        ),
        key=lambda d: (-d["n_docs"], str(d["source"])),
    )
    conc = mix_concentration(base, "__src").collect()[0]

    return {
        "n_docs": row["n_docs"],
        "n_sources": row["n_sources"],
        "null_text_docs": row["null_text_docs"],
        "total_tokens": row["total_tokens"],
        "mean_tokens": row["mean_tokens"],
        "p50_tokens": row["p50_tokens"],
        "p90_tokens": row["p90_tokens"],
        "exact_dup_rate": dup_rate,
        "source_mix": mix,
        "source_hhi": conc["hhi"],
        "source_entropy": conc["entropy"],
    }
