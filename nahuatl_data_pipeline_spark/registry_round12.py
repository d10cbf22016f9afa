"""Round-12 registrations.

- q171: PSL-based registered-domain stats (functions/url.py:
  url_domain_psl) — hash-certifies the round-12 pluggable public-suffix
  variant (round-11 verdict #5) the way q164 certifies the literal-
  tuple default: a synthetic URL table deterministic in doc_id whose
  hosts exercise every PSL rule kind (multi-label exact rules incl. the
  ``blogspot.co.uk`` private-domain case the 7-tuple default folds
  wrong, a ``*.ck`` wildcard, the ``!www.ck`` exception, the implicit
  ``*`` default, and the IPv4 short-circuit), with the FULL PSL
  algorithm mirrored in DuckDB from the same ``_Q171_RULES`` literal —
  candidate last-k-label slices joined against per-length rule sets,
  longest-match suffix length, exception override, suffix+1 registered
  domain. One rule literal drives both engines, so the algorithm (not
  hand-derived answers) is what the hash certifies.

Kept deliberately SMALL (1 entry): round 12 must let the r08-stale
block (q60–q80 + q108, 21 queries) rotate through the 50-slot
certification window (round-11 verdict #4) — 1 new + 21 r08 still
leaves 28 slots for the oldest-r09 tail, clearing the union staleness
floor to r09.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.registry import register
from nahuatl_data_pipeline_spark.schemas import load_table

# ---------------------------------------------------------------------------
# q171: PSL registered-domain stats (oracle twin of url_domain_psl)
# ---------------------------------------------------------------------------

# ONE rule literal for both engines (the q22/q25 single-source pattern).
# Small by design — the operator takes the real ~9k-rule file at runtime
# (load_public_suffix_list); what the oracle certifies is the ALGORITHM.
_Q171_RULES: dict[str, tuple[str, ...]] = {
    "exact": ("com", "io", "uk", "co.uk", "github.io", "blogspot.co.uk"),
    "wildcard": ("ck",),
    "exception": ("www.ck",),
}


def _q171_urls_sql() -> str:
    """Synthetic crawl URLs deterministic in doc_id — Spark twin below
    is expression-for-expression identical."""
    return """
    SELECT doc_id,
      CASE WHEN doc_id % 97 = 0 THEN NULL
           ELSE 'https://'
             || (CASE WHEN doc_id % 8 = 0
                        THEN 'myblog' || CAST(doc_id % 5 AS VARCHAR)
                             || '.blogspot.co.uk'
                      WHEN doc_id % 8 = 1 THEN 'www.news.bbc.co.uk'
                      WHEN doc_id % 8 = 2
                        THEN 'pages' || CAST(doc_id % 3 AS VARCHAR)
                             || '.github.io'
                      WHEN doc_id % 8 = 3
                        THEN 'a.b' || CAST(doc_id % 4 AS VARCHAR) || '.ck'
                      WHEN doc_id % 8 = 4 THEN 'shop.www.ck'
                      WHEN doc_id % 8 = 5
                        THEN 'x.example' || CAST(doc_id % 7 AS VARCHAR)
                             || '.com'
                      WHEN doc_id % 8 = 6 THEN 'site.unknowntld'
                      ELSE '192.168.0.' || CAST(doc_id % 9 AS VARCHAR)
                 END)
             || '/p/' || CAST(doc_id % 13 AS VARCHAR)
      END AS url
    FROM documents
"""


def _q171_sql() -> str:
    """DuckDB mirror of ``url_domain_psl`` over ``_Q171_RULES``: the
    same candidate-slice / longest-match / exception-override /
    implicit-default algorithm, generated from the same rule literal."""
    by_len: dict[tuple[str, int], list[str]] = {}
    for kind, rules in _Q171_RULES.items():
        for r in rules:
            by_len.setdefault((kind, r.count(".") + 1), []).append(r)
    max_k = max(k for _, k in by_len)

    def in_list(expr: str, vals: list[str]) -> str:
        return f"{expr} IN ({', '.join(repr(v) for v in sorted(set(vals)))})"

    # candidate: last k labels (1-indexed DuckDB list slice)
    def cand(k: int) -> str:
        return f"ARRAY_TO_STRING(labels[nl - {k - 1}:nl], '.')"

    contribs = ["1"]  # implicit * default rule
    exc_cases = []
    for (kind, k), rules in sorted(by_len.items()):
        if kind == "exact":
            contribs.append(
                f"CASE WHEN nl >= {k} AND {in_list(cand(k), rules)} "
                f"THEN {k} ELSE 1 END"
            )
        elif kind == "wildcard":
            contribs.append(
                f"CASE WHEN nl >= {k + 1} AND {in_list(cand(k), rules)} "
                f"THEN {k + 1} ELSE 1 END"
            )
        else:
            exc_cases.append(
                f"WHEN nl >= {k} AND {in_list(cand(k), rules)} THEN {k - 1}"
            )
    exc_sql = (
        "CASE " + " ".join(exc_cases) + " END" if exc_cases else "NULL"
    )
    return f"""
    WITH urls AS ({_q171_urls_sql()}),
    hosts AS (
      SELECT doc_id, url,
             REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
               REGEXP_EXTRACT(url, '^[a-z][a-z0-9+.\\-]*://([^/?#]+)', 1),
               '^.*@', ''), ':[0-9]*$', ''), '^www\\.', ''),
               '\\.$', '') AS host
      FROM urls
    ),
    lab AS (
      SELECT doc_id, url, host, STRING_SPLIT(host, '.') AS labels,
             LEN(STRING_SPLIT(host, '.')) AS nl
      FROM hosts
    ),
    suf AS (
      SELECT *,
             COALESCE({exc_sql}, GREATEST({", ".join(contribs)})) AS s
      FROM lab
    ),
    dom AS (
      SELECT doc_id, url,
             CASE WHEN host IS NULL OR host = '' THEN NULL
                  WHEN REGEXP_MATCHES(host, '^\\[') THEN host
                  WHEN REGEXP_MATCHES(host, '^[0-9]+(\\.[0-9]+){{3}}$')
                    THEN host
                  WHEN nl > s THEN ARRAY_TO_STRING(labels[nl - s:nl], '.')
                  ELSE NULL END AS domain
      FROM suf
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_pages
    FROM dom GROUP BY 1
"""


def _q171_url_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_q171_urls_sql`` (expression-for-expression)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    host = (
        F.when(
            d % 8 == 0,
            F.concat(
                F.lit("myblog"), (d % 5).cast("string"),
                F.lit(".blogspot.co.uk"),
            ),
        )
        .when(d % 8 == 1, F.lit("www.news.bbc.co.uk"))
        .when(
            d % 8 == 2,
            F.concat(
                F.lit("pages"), (d % 3).cast("string"), F.lit(".github.io")
            ),
        )
        .when(
            d % 8 == 3,
            F.concat(F.lit("a.b"), (d % 4).cast("string"), F.lit(".ck")),
        )
        .when(d % 8 == 4, F.lit("shop.www.ck"))
        .when(
            d % 8 == 5,
            F.concat(
                F.lit("x.example"), (d % 7).cast("string"), F.lit(".com")
            ),
        )
        .when(d % 8 == 6, F.lit("site.unknowntld"))
        .otherwise(
            F.concat(F.lit("192.168.0."), (d % 9).cast("string"))
        )
    )
    url = F.when(d % 97 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("https://"), host, F.lit("/p/"), (d % 13).cast("string")
        )
    )
    return docs.select("doc_id", url.alias("url"))


@register("q171_psl_domain_stats", _q171_sql())
def q171_psl_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain stats through the PLUGGABLE public-suffix
    variant (functions/url.py:url_domain_psl — full publicsuffix.org
    semantics as broadcast-only joins, zero exchanges added to the
    corpus; the per-(kind, label-count) rule frames here come from the
    shared _Q171_RULES literal, in production from
    load_public_suffix_list's ~9k-rule file). The hosts exercise every
    rule kind: multi-label private-domain rules (blogspot.co.uk — the
    case the 7-tuple oracle default folds wrong, its documented
    divergence), *.ck wildcards, the !www.ck exception, the implicit
    * default, and the IPv4 short-circuit. The DuckDB oracle recomputes
    the ALGORITHM (candidate slices, longest match, exception override)
    from the same rule literal, not hand-derived answers."""
    from nahuatl_data_pipeline_spark.functions.url import url_domain_psl

    urls = _q171_url_table(spark, sf_dir)
    rules = {k: list(v) for k, v in _Q171_RULES.items()}
    dom = url_domain_psl(urls, "url", rules)
    return dom.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("url").cast("long").alias("n_pages"),
    )
