"""Round-9 registrations: the round-8 operator families promoted to
driver-certified queries (the CLAUDE.md rule — every operator needs a
``queries()`` entry + oracle).

- q157: fuzzy bipartite decontamination (operators/fuzzy_dedup.py:575),
  oracle via the shared ``banded_candidates_ctes`` builder so the
  candidate scheme cannot drift from q25/q38/q108.
- q158/q159: URL canonicalization + URL-key dedup (functions/url.py),
  fully SQL-mirrored string/array algebra over a deterministic
  synthetic crawl table derived from ``documents``.
- q160: length-grouped batching + padding accounting
  (operators/packing.py:160,221) — deterministic hash/window algebra.
- q161: distributed XML source (sources/readers.py:read_xml) over a
  committed fixture; the oracle is the fixture's rows as VALUES, so the
  parse itself is what gets hash-checked.
- q162: gold-standard audit metrics (operators/audit.py) as one
  aggregate row over a deterministic SFT-shaped projection.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nahuatl_data_pipeline_spark.functions.url import (
    DEFAULT_TRACKING_PARAMS,
    _tracking_regex,
)
from nahuatl_data_pipeline_spark.registry import (
    banded_candidates_ctes,
    register,
)
from nahuatl_data_pipeline_spark.schemas import load_table

_REPO_ROOT = Path(__file__).resolve().parent.parent

# ---------------------------------------------------------------------------
# q157: fuzzy bipartite decontamination
# ---------------------------------------------------------------------------

# Eval suite = docs with doc_id % 97 == 0 (the q61 convention);
# contaminated train docs are planted as PREFIXED rewrites of eval docs
# (ids + 3,000,000) — the paraphrase-tolerant band: a prefix edit
# changes only the leading 3-gram shingles, so shingle Jaccard stays
# high while many exact 13-gram windows shift. The oracle reuses the
# shared banding CTE chain over a union relation with the eval side
# offset to a disjoint id range (+5,000,000 > every train id), which
# makes the self-join candidates restricted to cross pairs IDENTICAL to
# the operator's bipartite band join (band-key equality is symmetric).
_Q157_EVAL_OFFSET = 5_000_000

_Q157_SQL = f"""
    WITH ev AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
    ),
    tr AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 3000000 AS doc_id, 'alpha beta gamma ' || text AS text
      FROM ev
    ),
    base AS (
      SELECT doc_id, text FROM tr
      UNION ALL
      SELECT doc_id + {_Q157_EVAL_OFFSET} AS doc_id, text FROM ev
    ),
    {banded_candidates_ctes(num_hashes=6, band_size=2)},
    pairs AS (
      SELECT cand.id_a AS train_id,
             ROUND(CAST(LEN(LIST_INTERSECT(sa.shingles, sb.shingles)) AS DOUBLE)
                   / LEN(LIST_DISTINCT(LIST_CONCAT(sa.shingles, sb.shingles))), 6)
               AS jaccard
      FROM cand
      JOIN sig sa ON sa.doc_id = cand.id_a
      JOIN sig sb ON sb.doc_id = cand.id_b
      WHERE cand.id_a < {_Q157_EVAL_OFFSET}
        AND cand.id_b >= {_Q157_EVAL_OFFSET}
    )
    SELECT train_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval_matches,
           MAX(jaccard) AS max_jaccard
    FROM pairs
    WHERE jaccard >= 0.5
    GROUP BY train_id
"""


@register("q157_fuzzy_decontamination", _Q157_SQL)
def q157_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy bipartite decontamination flags
    (operators/fuzzy_dedup.py:fuzzy_contamination_flags): train docs
    near-duplicating an eval doc at 3-gram shingle Jaccard ≥ 0.5 — the
    paraphrase-tolerant complement of q61's exact 13-gram protocol
    (GPT-3 appendix C). Eval bands/shingles broadcast; the band join is
    bipartite (train ⨝ eval, never a self-join), so cost is linear in
    the train side for a fixed benchmark suite."""
    from nahuatl_data_pipeline_spark.operators.fuzzy_dedup import (
        fuzzy_contamination_flags,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Oracle-parity invariant: the oracle classifies cross pairs purely
    # by id range, which requires planted train ids (doc_id + 3e6) to
    # stay BELOW the eval offset 5e6 — i.e. every source doc_id < 2e6.
    # That holds at every certification scale (max 4999 at sf0.01, the
    # only place the oracle is ever compared). Datasets beyond the
    # bound (the /tmp scale replicas stride ids by 10M per copy, max
    # ~990M at 100×) would make the STATIC offsets either collide with
    # real ids or silently mis-classify oracle pairs — so the plant
    # offset is derived from the data bound instead: certification
    # scales take the certified static arm unchanged, scale runs get a
    # collision-free power-of-10 offset above every real id. One
    # bounded 1-row aggregate over the pruned doc_id column.
    max_id = docs.agg(F.max("doc_id")).first()[0] or 0
    if max_id + 3_000_000 < _Q157_EVAL_OFFSET:
        plant_offset = 3_000_000  # the oracle-mirrored certified arm
    else:
        plant_offset = 10 ** len(str(max_id))
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    planted = ev.select(
        (F.col("doc_id") + plant_offset).alias("doc_id"),
        F.concat(F.lit("alpha beta gamma "), F.col("text")).alias("text"),
    )
    train = docs.filter(F.col("doc_id") % 97 != 0).unionByName(planted)
    return fuzzy_contamination_flags(
        train,
        ev,
        id_col="doc_id",
        text_col="text",
        shingle_n=3,
        num_hashes=6,
        band_size=2,
        jaccard_threshold=0.5,
    )


# ---------------------------------------------------------------------------
# q158/q159: URL canonicalization + URL-key dedup
# ---------------------------------------------------------------------------

# Deterministic synthetic crawl table over documents: every
# canonicalization rule is exercised by construction (scheme case,
# www., :443 on https AND on http where it must survive, trailing
# slash, fragment, tracking params, parameter order) plus the junk
# rows (whitespace-only / NULL) that must pass through dedup.
_URLS_SQL = """
    SELECT doc_id, n_chars,
      CASE WHEN doc_id % 89 = 0 THEN '   '
           WHEN doc_id % 89 = 1 THEN NULL
           ELSE (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END)
             || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM'
                      WHEN doc_id % 3 = 1 THEN 'example.com:443'
                      ELSE 'Example.com' END)
             || '/Page/' || CAST(doc_id % 7 AS VARCHAR)
             || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
             || (CASE WHEN doc_id % 4 = 0 THEN '?b=2&utm_source=x&a=1'
                      WHEN doc_id % 4 = 1 THEN '?a=1&b=2'
                      WHEN doc_id % 4 = 2 THEN '?utm_campaign=z&ref=home'
                      ELSE '' END)
             || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END)
      END AS url
    FROM documents
"""

# DuckDB mirror of functions/url.py:canonicalize_url over a prior CTE
# ``urls(doc_id, url)``. The tracking regex is built from the SAME
# tuple as the Spark expression (ONE definition).
_CANON_CTES = f"""c1 AS (
      SELECT doc_id, n_chars, url,
             REGEXP_REPLACE(
               REGEXP_EXTRACT(TRIM(url), '^(\\S*)', 1), '#.*$', '') AS u
      FROM urls
    ),
    c2 AS (
      SELECT *, REGEXP_EXTRACT(u, '^([^?]*)', 1) AS base,
             REGEXP_EXTRACT(u, '^[^?]*\\?(.*)$', 1) AS query
      FROM c1
    ),
    c3 AS (
      SELECT *,
        REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
          LOWER(REGEXP_EXTRACT(base, '^([A-Za-z][A-Za-z0-9+.\\-]*://[^/]*)', 1)),
          '^(https?://)www\\.', '\\1'),
          '^(http://[^/:]+):80$', '\\1'),
          '^(https://[^/:]+):443$', '\\1') AS prefix,
        REGEXP_REPLACE(REGEXP_REPLACE(base,
          '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/]*', ''), '/+$', '') AS path,
        ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(STR_SPLIT(query, '&'),
          p -> p <> '' AND NOT REGEXP_MATCHES(p, '{_tracking_regex(DEFAULT_TRACKING_PARAMS)}'))),
          '&') AS q
      FROM c2
    ),
    canon AS (
      SELECT doc_id, n_chars, url,
             CASE WHEN LENGTH(q) > 0 THEN prefix || path || '?' || q
                  ELSE prefix || path END AS canonical_url
      FROM c3
    )"""


def _url_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_URLS_SQL`` (expression-for-expression)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("HTTP://"))
    host = (
        F.when(d % 3 == 0, F.lit("WWW.Example.COM"))
        .when(d % 3 == 1, F.lit("example.com:443"))
        .otherwise(F.lit("Example.com"))
    )
    path = F.concat(
        F.lit("/Page/"),
        (d % 7).cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(d % 4 == 0, F.lit("?b=2&utm_source=x&a=1"))
        .when(d % 4 == 1, F.lit("?a=1&b=2"))
        .when(d % 4 == 2, F.lit("?utm_campaign=z&ref=home"))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 6 == 0, F.lit("#sec")).otherwise(F.lit(""))
    url = (
        F.when(d % 89 == 0, F.lit("   "))
        .when(d % 89 == 1, F.lit(None).cast("string"))
        .otherwise(F.concat(scheme, host, path, query, frag))
    )
    return docs.select("doc_id", "n_chars", url.alias("url"))


_Q158_SQL = f"""
    WITH urls AS ({_URLS_SQL}),
    {_CANON_CTES}
    SELECT doc_id, url, canonical_url FROM canon
"""


@register("q158_url_canonicalize", _Q158_SQL)
def q158_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (functions/url.py:canonicalize_url) — pure
    whole-stage-codegen column expression (plan-asserted UDF-free in
    tests/test_url.py); every rule oracle-mirrored in DuckDB string/
    list algebra."""
    from nahuatl_data_pipeline_spark.functions.url import canonicalize_url

    return _url_table(spark, sf_dir).select(
        "doc_id",
        "url",
        canonicalize_url(F.col("url")).alias("canonical_url"),
    )


_Q159_SQL = f"""
    WITH urls AS ({_URLS_SQL}),
    {_CANON_CTES},
    keyed AS (
      SELECT doc_id, url, canonical_url,
             ROW_NUMBER() OVER (
               PARTITION BY canonical_url
               ORDER BY doc_id ASC, url ASC) AS rn
      FROM canon
      WHERE canonical_url IS NOT NULL AND canonical_url <> ''
    )
    SELECT doc_id, url, canonical_url FROM keyed WHERE rn = 1
    UNION ALL
    SELECT doc_id, url, canonical_url FROM canon
    WHERE canonical_url IS NULL OR canonical_url = ''
"""


@register("q159_url_dedup", _Q159_SQL)
def q159_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-key dedup (functions/url.py:url_dedup): ONE shuffle on the
    canonical key, keep-first by crawl order (doc_id asc — the
    keep-latest/keep-best lever is ``order_col``); NULL/empty canonical
    keys pass through undeduplicated (junk URLs are not one page's
    crawl variants — the round-9 ADVICE fix, certified here)."""
    from nahuatl_data_pipeline_spark.functions.url import url_dedup

    return url_dedup(
        _url_table(spark, sf_dir),
        "url",
        order_col="doc_id",
        descending=False,
    ).select("doc_id", "url", "canonical_url")


# ---------------------------------------------------------------------------
# q160: length-grouped batching + padding accounting
# ---------------------------------------------------------------------------

_Q160_SQL = r"""
    WITH t AS (
      SELECT doc_id,
             COALESCE(CAST(LEN(LIST_FILTER(
               REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
               x -> x <> '')) AS BIGINT), 0) AS n_tokens
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, n_tokens,
             CAST(CEIL(n_tokens / 64.0) AS BIGINT) AS bucket,
             CAST(('0x' || SUBSTRING(MD5('0:' ||
               COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 15)) AS BIGINT)
               % 16 AS shard
      FROM t
    ),
    batched AS (
      SELECT *,
             CAST(FLOOR((ROW_NUMBER() OVER (
               PARTITION BY bucket, shard
               ORDER BY MD5('1:' || COALESCE(CAST(doc_id AS VARCHAR), '')),
                        doc_id) - 1) / 8) AS BIGINT) AS batch_id
      FROM keyed
    ),
    stats AS (
      SELECT CAST(bucket AS VARCHAR) || '/' || CAST(shard AS VARCHAR)
               || '/' || CAST(batch_id AS VARCHAR) AS batch_key,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MAX(n_tokens) AS max_tokens,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      FROM batched
      GROUP BY 1
    )
    SELECT batch_key, n_rows, max_tokens, sum_tokens,
           CAST(n_rows * max_tokens AS BIGINT) AS padded_tokens,
           CAST(n_rows * max_tokens - sum_tokens AS BIGINT) AS waste_tokens
    FROM stats
"""


@register("q160_length_batch_stats", _Q160_SQL)
def q160_length_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batch assignment + per-batch padding accounting
    (operators/packing.py:length_grouped_batches/batch_padding_stats):
    deterministic (bucket, shard)-local batches — sharded windows so no
    length bucket funnels a decade of same-length rows through one task
    — then one map-side-combined aggregate per batch handle."""
    from nahuatl_data_pipeline_spark.operators.packing import (
        batch_padding_stats,
        length_grouped_batches,
    )

    docs = load_table(spark, sf_dir, "documents")
    return batch_padding_stats(
        length_grouped_batches(
            docs, "doc_id", "text",
            batch_size=8, bucket_width=64, n_shards=16, seed=0,
        )
    )


# ---------------------------------------------------------------------------
# q161: distributed XML source over a committed fixture
# ---------------------------------------------------------------------------

_Q161_FIXTURE = str(_REPO_ROOT / "tests" / "fixtures" / "nahuatl_codex.xml")

# The oracle is the fixture's expected rows: what gets hash-certified
# is the XML parse itself (row-tag extraction, attribute columns,
# missing-child → NULL, unicode fidelity incl. macrons).
_Q161_SQL = """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'GEN',
       'In ipeuhyan oquiyocox in teotl in ilhuicatl ihuan in tlalli'),
      (CAST(2 AS BIGINT), 'GEN',
       'Auh in tlalli zan iuhcatca ahmo tlachihchiuhtli'),
      (CAST(3 AS BIGINT), 'GEN',
       'Ihuan in tlayohualli ipan in amictlan'),
      (CAST(4 AS BIGINT), 'EXO', 'Inin intoca in ipilhuan Israel'),
      (CAST(5 AS BIGINT), 'EXO', CAST(NULL AS VARCHAR)),
      (CAST(6 AS BIGINT), 'PSA',
       'Tlatecpanaliztli ica teocuicatl īhuān mācēhualiztli')
    ) AS t(verse_id, book, text)
"""


@register("q161_xml_source", _Q161_SQL)
def q161_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 distributed XML source (sources/readers.py:read_xml, Spark 4
    native rowTag reader) over a committed verse fixture — explicit
    schema (production contract: inference costs a scan and coerces
    aggressively), attributes as ``_``-prefixed columns, missing child
    elements as NULL, macron fidelity hash-checked via the oracle."""
    from nahuatl_data_pipeline_spark.sources.readers import read_xml

    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("_book", T.StringType()),
            T.StructField("t", T.StringType()),
        ]
    )
    return read_xml(
        spark, _Q161_FIXTURE, row_tag="verse", schema=schema
    ).select(
        F.col("_id").alias("verse_id"),
        F.col("_book").alias("book"),
        F.col("t").alias("text"),
    )


# ---------------------------------------------------------------------------
# q162: gold-standard audit metrics
# ---------------------------------------------------------------------------

_Q162_SFT_SQL = """
    SELECT
      CASE WHEN doc_id % 11 = 0 THEN NULL
           WHEN doc_id % 13 = 0 THEN '  '
           ELSE 'es frase ' || CAST(doc_id % 37 AS VARCHAR) END AS es,
      CASE WHEN doc_id % 19 = 0 THEN NULL
           WHEN doc_id % 17 = 0 THEN 'na'
           ELSE 'nah tlahtolli ' || CAST(doc_id % 53 AS VARCHAR) END AS nah
    FROM documents
"""

_Q162_SQL = f"""
    WITH sft AS ({_Q162_SFT_SQL}),
    d AS (SELECT COUNT(*) AS dr FROM (SELECT DISTINCT es, nah FROM sft)),
    s AS (
      SELECT COUNT(DISTINCT es)
             + CASE WHEN COUNT(CASE WHEN es IS NULL THEN 1 END) > 0
                    THEN 1 ELSE 0 END AS ds
      FROM sft
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(SUM(CASE WHEN es IS NULL THEN 1 ELSE 0 END)
                + SUM(CASE WHEN nah IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_values,
           CAST(COUNT(CASE WHEN TRIM(es) = '' THEN 1 END) AS BIGINT)
             AS empty_source,
           CAST(COUNT(CASE WHEN TRIM(nah) = '' THEN 1 END) AS BIGINT)
             AS empty_target,
           ROUND(AVG(LENGTH(es)), 1) AS src_len_avg,
           CAST(MAX(LENGTH(es)) AS INT) AS src_len_max,
           CAST(MIN(LENGTH(es)) AS INT) AS src_len_min,
           ROUND(AVG(LENGTH(nah)), 1) AS tgt_len_avg,
           CAST(MAX(LENGTH(nah)) AS INT) AS tgt_len_max,
           CAST(MIN(LENGTH(nah)) AS INT) AS tgt_len_min,
           CAST(COUNT(CASE WHEN LENGTH(nah) < 10 THEN 1 END) AS BIGINT)
             AS short_targets,
           CAST(COUNT(*) - (SELECT dr FROM d) AS BIGINT) AS exact_duplicates,
           CAST(COUNT(*) - (SELECT ds FROM s) AS BIGINT) AS source_duplicates
    FROM sft
"""


@register("q162_gold_audit", _Q162_SQL)
def q162_gold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-standard audit metrics (operators/audit.py:
    audit_metrics_frame, reference analyze_gold_standard.py:24-108):
    every volumetry/quality scalar in ONE aggregate pass over a
    deterministic SFT-shaped projection — including the pandas-style
    null-inclusive source-duplicate count (round-9 ADVICE fix,
    certified here)."""
    from nahuatl_data_pipeline_spark.operators.audit import (
        audit_metrics_frame,
    )

    d = F.col("doc_id")
    sft = load_table(spark, sf_dir, "documents").select(
        F.when(d % 11 == 0, F.lit(None).cast("string"))
        .when(d % 13 == 0, F.lit("  "))
        .otherwise(F.concat(F.lit("es frase "), (d % 37).cast("string")))
        .alias("es"),
        F.when(d % 19 == 0, F.lit(None).cast("string"))
        .when(d % 17 == 0, F.lit("na"))
        .otherwise(
            F.concat(F.lit("nah tlahtolli "), (d % 53).cast("string"))
        )
        .alias("nah"),
    )
    return audit_metrics_frame(sft, "es", "nah")
