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

- q172: URL head-stage survivors (plans/curation_pipeline.py:
  url_head_stages) — hash-certifies the composed crawl head block's
  EXACT window semantics (canonical-key dedup rank-1 by (raw url,
  doc_id); md5-ordered per-domain cap — ``seeded_md5``'s exact
  expression; per-row junk keys for NULL/empty canonicals) against a
  DuckDB ROW_NUMBER mirror, over q164's synthetic URL table (which
  plants the junk/userinfo/IPv6/two-label-suffix branches). Until now
  the block was certified only transitively (integration tests + the
  mixed-replica predictor); this pins the row-level semantics in the
  driver's hash loop.

Kept deliberately SMALL (2 entries): round 12 must let the r08-stale
block (q60–q80 + q108, 21 queries) rotate through the 50-slot
certification window (round-11 verdict #4) — 2 new + 21 r08 still
leaves 27 slots for the oldest-r09 tail, clearing the union staleness
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


def psl_oracle_ctes(
    rules: dict[str, tuple[str, ...]], src_cte: str = "hosts"
) -> str:
    """ONE definition of the DuckDB PSL-algorithm mirror (the
    banded_candidates_ctes pattern, CLAUDE.md rule): given a prior CTE
    ``src_cte`` exposing a ``host`` column, emit the
    ``lab``/``suf``/``dom`` CTE chain whose ``dom`` carries every
    ``src_cte`` column plus ``domain`` — candidate last-k-label slices
    joined against per-length rule sets, longest-match suffix length,
    exception override, implicit ``*`` default, suffix+1 registered
    domain, IPv4/bracketed-IPv6/public-suffix-host short-circuits.
    Shared by the q171 (stats) and q174 (composed head stages) oracles
    so the algorithm mirror cannot drift between them."""
    by_len: dict[tuple[str, int], list[str]] = {}
    for kind, rs in rules.items():
        for r in rs:
            by_len.setdefault((kind, r.count(".") + 1), []).append(r)

    def in_list(expr: str, vals: list[str]) -> str:
        return f"{expr} IN ({', '.join(repr(v) for v in sorted(set(vals)))})"

    # candidate: last k labels (1-indexed DuckDB list slice)
    def cand(k: int) -> str:
        return f"ARRAY_TO_STRING(labels[nl - {k - 1}:nl], '.')"

    contribs = ["1"]  # implicit * default rule
    exc_cases = []
    for (kind, k), rs in sorted(by_len.items()):
        if kind == "exact":
            contribs.append(
                f"CASE WHEN nl >= {k} AND {in_list(cand(k), rs)} "
                f"THEN {k} ELSE 1 END"
            )
        elif kind == "wildcard":
            contribs.append(
                f"CASE WHEN nl >= {k + 1} AND {in_list(cand(k), rs)} "
                f"THEN {k + 1} ELSE 1 END"
            )
        else:
            exc_cases.append(
                f"WHEN nl >= {k} AND {in_list(cand(k), rs)} THEN {k - 1}"
            )
    exc_sql = (
        "CASE " + " ".join(exc_cases) + " END" if exc_cases else "NULL"
    )
    return f"""lab AS (
      SELECT *, STRING_SPLIT(host, '.') AS labels,
             LEN(STRING_SPLIT(host, '.')) AS nl
      FROM {src_cte}
    ),
    suf AS (
      SELECT *,
             COALESCE({exc_sql}, GREATEST({", ".join(contribs)})) AS s
      FROM lab
    ),
    dom AS (
      SELECT *,
             CASE WHEN host IS NULL OR host = '' THEN NULL
                  WHEN REGEXP_MATCHES(host, '^\\[') THEN host
                  WHEN REGEXP_MATCHES(host, '^[0-9]+(\\.[0-9]+){{3}}$')
                    THEN host
                  WHEN nl > s THEN ARRAY_TO_STRING(labels[nl - s:nl], '.')
                  ELSE NULL END AS domain
      FROM suf
    )"""


def _q171_sql() -> str:
    """DuckDB mirror of ``url_domain_psl`` over ``_Q171_RULES`` via the
    shared :func:`psl_oracle_ctes` builder (round-13 refactor — OUTPUT-
    IDENTICAL: the builder emits the same lab/suf/dom algebra with
    SELECT * instead of a named projection, and the final aggregate
    projects the identical (domain, n_docs, n_pages) columns, so the
    result set is unchanged at any scale and no recertification pin is
    needed). Host extraction shares ``registry.host_strip_sql`` (one
    definition with the q164/q172 mirrors); the registered-domain CASE
    is PSL-specific by design (that is what q171 certifies)."""
    from nahuatl_data_pipeline_spark.registry import host_strip_sql

    return f"""
    WITH urls AS ({_q171_urls_sql()}),
    hosts AS (
      SELECT doc_id, url,
             {host_strip_sql("url")} AS host
      FROM urls
    ),
    {psl_oracle_ctes(_Q171_RULES)}
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


# ---------------------------------------------------------------------------
# q172: URL head-stage survivors (oracle twin of url_head_stages)
# ---------------------------------------------------------------------------

_Q172_CAP = 3  # small enough to bite on q164's ~70-doc domains at sf0.01


def url_dedup_ctes() -> str:
    """``keyed``/``dedup`` CTE pair mirroring ``url_head_stages``' first
    window over a prior ``canon`` CTE (rank-1 per canonical ordered by
    raw url then doc_id; per-row CHR(0) junk keys for NULL/empty
    canonicals) — ONE definition shared by the q172/q174 oracles."""
    return """keyed AS (
      SELECT doc_id, url, canonical_url,
             CASE WHEN canonical_url IS NULL OR canonical_url = ''
                  THEN CHR(0) || 'junk:' || CAST(doc_id AS VARCHAR)
                  ELSE canonical_url END AS dk
      FROM canon
    ),
    dedup AS (
      SELECT doc_id, url, canonical_url FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY dk ORDER BY url ASC, doc_id ASC) AS rn
        FROM keyed
      ) WHERE rn = 1
    )"""


def cap_select_sql(cap: int, src: str = "dom") -> str:
    """Final per-domain-cap SELECT mirroring ``url_head_stages``' second
    window over a CTE exposing (doc_id, url, domain): keep the first
    ``cap`` rows per domain ordered by (md5('42:'||url), url, doc_id) —
    ``seeded_md5``'s exact expression — with NULL-domain rows never
    capped. ONE definition shared by the q172/q174 oracles."""
    return f"""SELECT doc_id, url FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY COALESCE(domain,
                              CHR(0) || 'junk:' || CAST(doc_id AS VARCHAR))
        ORDER BY MD5('42:' || url) ASC, url ASC, doc_id ASC) AS rn2
      FROM {src}
    ) WHERE domain IS NULL OR rn2 <= {cap}"""


def _q172_sql() -> str:
    """DuckDB ROW_NUMBER mirror of url_head_stages over q164's URL
    table: canonicalization via the shared _CANON_CTES, url_domain via
    the q164 regex mirror, dedup + cap windows via the shared
    :func:`url_dedup_ctes`/:func:`cap_select_sql` builders (round-13
    refactor — OUTPUT-IDENTICAL: the builders emit the exact CTE text
    previously inlined here, so no recertification pin is needed)."""
    from nahuatl_data_pipeline_spark.registry import (
        _Q164_URLS_SQL,
        domain_case_sql,
        host_strip_sql,
    )
    from nahuatl_data_pipeline_spark.registry_round9 import _CANON_CTES
    return f"""
    WITH urls AS ({_Q164_URLS_SQL}),
    {_CANON_CTES},
    {url_dedup_ctes()},
    hosts AS (
      SELECT doc_id, url,
             {host_strip_sql("canonical_url")} AS host
      FROM dedup
    ),
    dom AS (
      SELECT doc_id, url,
             {domain_case_sql("host")} AS domain
      FROM hosts
    )
    {cap_select_sql(_Q172_CAP)}
"""


@register("q172_url_head_survivors", _q172_sql())
def q172_url_head_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl head block's surviving rows
    (plans/curation_pipeline.py:url_head_stages — the block bench's
    full-stack decade rows and the curate/run CLIs execute), certified
    row-for-row: URL dedup keeps rank 1 per canonical ordered by (raw
    url, doc_id); the per-domain cap keeps the first _Q172_CAP
    survivors per registered domain ordered by seeded_md5(url, 42) —
    and junk rows (NULL/whitespace urls planted by q164's table) pass
    through both windows on per-row keys, never funnelling one task.
    Two window shuffles keyed on bytes of URL, nothing else — the
    cheap pre-filter posture the 100 TB curation argument rests on."""
    from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
        url_head_stages,
    )
    from nahuatl_data_pipeline_spark.registry_round10 import _q164_url_table

    urls = _q164_url_table(spark, sf_dir).select("doc_id", "url")
    out, _, _ = url_head_stages(
        urls, "url", F.col("doc_id"), max_docs_per_domain=_Q172_CAP
    )
    return out.select("doc_id", "url")
