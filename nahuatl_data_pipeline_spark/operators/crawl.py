"""Domain-level crawl analytics: the per-host/per-registered-domain
aggregate every crawl-curation pipeline runs before URL- or content-
level dedup — it feeds domain blocklists, per-domain caps (the domain
analogue of ``operators/mixing.py``'s source caps) and crawl-budget
decisions (RefinedWeb §3.1 / FineWeb both gate on per-domain dup rate
and volume share before any text-side processing).

Beyond the reference: its sources are curated HF datasets keyed by
stable ids (``manager.py:17-21`` hashes url+ts into an id and never
aggregates by site), so it has no domain-level view at all.

Scale posture (100 TB): ONE shuffle — a single hash aggregate keyed by
registered domain. Every output stat is a decomposable partial
aggregate (count / distinct-count / sum), so map-side combine bounds
the shuffle at |domains| x partitions regardless of corpus size, and a
hot domain (half the crawl is one CDN) costs reducer time, not memory
— there is no per-domain window or list collection. The corpus-total
denominator rides a 1-row broadcast crossJoin (the q75/q83 pattern).
The two exact COUNT(DISTINCT ...) trigger Spark's expand (2x the
aggregate input, not the scan); at open-web scale swap them for
``approx_count_distinct`` — the oracle keeps the exact form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.url import (
    MULTI_LABEL_SUFFIXES,
    canonicalize_url,
    url_domain,
)


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    *,
    chars_col: str = "n_chars",
    lang_col: str = "lang",
    suffixes: tuple[str, ...] = MULTI_LABEL_SUFFIXES,
    **canon_kwargs,
) -> DataFrame:
    """Per-registered-domain crawl profile.

    Output (one row per domain, junk urls grouped under NULL):

    - ``n_docs``       crawled documents;
    - ``n_pages``      distinct canonical urls (NULL/empty canonical
      keys never count as a page);
    - ``dup_frac``     ``1 - n_pages/n_docs`` — the re-crawl /
      tracking-variant rate that decides whether URL dedup is worth
      running before content dedup; NULL when the group has no pages;
    - ``n_langs``      distinct language labels seen on the domain;
    - ``total_chars``  crawl bytes proxy;
    - ``chars_share``  the domain's fraction of corpus chars — the
      per-domain cap / blocklist signal.
    """
    canon = canonicalize_url(F.col(url_col), **canon_kwargs)
    base = df.select(
        canon.alias("__canon"),
        F.col(chars_col).alias("__chars"),
        F.col(lang_col).alias("__lang"),
    ).withColumn("__domain", url_domain(F.col("__canon"), suffixes=suffixes))
    page = F.when(F.col("__canon") == "", F.lit(None)).otherwise(
        F.col("__canon")
    )
    per = base.groupBy(F.col("__domain").alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(page).alias("n_pages"),
        F.countDistinct(F.col("__lang")).alias("n_langs"),
        F.sum("__chars").alias("total_chars"),
    )
    grand = base.agg(F.sum("__chars").alias("__grand"))
    return per.crossJoin(F.broadcast(grand)).select(
        "domain",
        "n_docs",
        "n_pages",
        F.when(
            F.col("n_pages") > 0,
            F.round(F.lit(1.0) - F.col("n_pages") / F.col("n_docs"), 4),
        ).alias("dup_frac"),
        "n_langs",
        "total_chars",
        F.round(F.col("total_chars") / F.col("__grand"), 6).alias(
            "chars_share"
        ),
    )
