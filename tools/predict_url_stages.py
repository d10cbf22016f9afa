"""Exact ground truth for the URL-stage decade run
(``SPARK_GRAFT_PIPELINE_URL_STAGES=1 bench.py --pipeline``).

Two replica shapes:

- **Native url column** (make_scale_data.py --mixed, round-11 verdict
  #3): canonical/domain are recomputed from doc_id via the SHARED
  ``mixed_canonical_sql`` / ``mixed_domain_sql`` formulas — which
  test_make_scale_data.py asserts equal the ENGINE's
  ``canonicalize_url``/``url_domain`` output row for row, so this
  predictor cannot drift from what the pipeline computes. For the
  full gate stack on such replicas use
  ``predict_mixed_gates.py --url-stages`` (every stat exact).
- **Legacy synthetic attach** (replicas without a url column): mirrors
  bench.py's formula over the train ids (the whole documents table when
  the replica carries evalset.parquet, the doc_id % 97 != 0 slice
  otherwise).

Both recompute the head-stage drop counts set-exactly, with no
assumption that doc_ids are unique:

- url_dups       = rows − distinct canonical URLs (the pipeline keeps
                   rank 1 per canonical key);
- domain_capped  = Σ_host max(0, survivors(host) − cap), cap = 100 —
                   the per-domain window drops everything past the cap
                   among the URL-dedup survivors (each distinct
                   canonical yields exactly one survivor, and the
                   domain is a function of the canonical).

Usage: python tools/predict_url_stages.py SF_DIR
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CAP = 100


def _has_url_column(con: duckdb.DuckDBPyConnection, docs: str) -> bool:
    cols = [
        r[0]
        for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{docs}') LIMIT 0"
        ).fetchall()
    ]
    return "url" in cols


def predict(sf_dir: str, psl_file: str | None = None) -> dict[str, int]:
    con = duckdb.connect()
    docs = os.path.join(sf_dir, "documents.parquet")
    if _has_url_column(con, docs):
        from make_scale_data import mixed_canonical_sql, mixed_domain_sql

        if psl_file is not None:
            # PSL cap-key configuration (SPARK_GRAFT_PIPELINE_PSL_FILE):
            # closed-form valid iff the file resolves the planted host
            # families as the formula says — verified, not assumed
            sys.path.insert(
                0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            from predict_mixed_gates import validated_psl_rules

            validated_psl_rules(psl_file)

        canon_sql = f"""
        SELECT doc_id,
               {mixed_canonical_sql()} AS c,
               {mixed_domain_sql(psl=psl_file is not None)} AS host
        FROM read_parquet('{docs}')
        """
    elif psl_file is not None:
        raise ValueError("--psl-file requires a native-url replica")
    else:
        train_filter = (
            "TRUE"
            if os.path.exists(os.path.join(sf_dir, "evalset.parquet"))
            else "doc_id % 97 <> 0"
        )
        canon_sql = f"""
        SELECT doc_id,
               CASE WHEN doc_id % 100 = 1 THEN 'https://dupsite.com/shared'
                    ELSE 'https://ex' || CAST(doc_id % 499 AS VARCHAR)
                         || '.com/p/' || CAST(doc_id AS VARCHAR)
               END AS c,
               CASE WHEN doc_id % 100 = 1 THEN 'dupsite.com'
                    ELSE 'ex' || CAST(doc_id % 499 AS VARCHAR) || '.com'
               END AS host
        FROM read_parquet('{docs}') WHERE {train_filter}
        """
    row = con.sql(
        f"""
        WITH canon AS ({canon_sql}),
        survivors AS (SELECT host, COUNT(DISTINCT c) AS n FROM canon GROUP BY host)
        SELECT (SELECT COUNT(*) - COUNT(DISTINCT c) FROM canon) AS url_dups,
               (SELECT COALESCE(SUM(CASE WHEN n > {CAP} THEN n - {CAP}
                                         ELSE 0 END), 0) FROM survivors)
                 AS domain_capped
        """
    ).fetchone()
    return {"url_dups": int(row[0]), "domain_capped": int(row[1])}


if __name__ == "__main__":
    from predict_mixed_gates import pop_psl_arg

    argv, psl_file = pop_psl_arg(sys.argv[1:])
    print(json.dumps(predict(argv[0], psl_file=psl_file)))
