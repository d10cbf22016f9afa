"""Exact ground truth for the URL-stage decade run
(``SPARK_GRAFT_PIPELINE_URL_STAGES=1 bench.py --pipeline``).

Mirrors bench.py's synthetic URL formula over the replica's train ids
(the whole documents table when the replica carries evalset.parquet,
the doc_id % 97 != 0 slice otherwise) and recomputes both head-stage
drop counts set-exactly, with no assumption that doc_ids are unique:

- url_dups       = rows − distinct canonical URLs (the pipeline keeps
                   rank 1 per canonical key);
- domain_capped  = Σ_host max(0, survivors(host) − cap), cap = 100 —
                   the per-domain window drops everything past the cap
                   among the URL-dedup survivors.

Usage: python tools/predict_url_stages.py SF_DIR
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

CAP = 100


def predict(sf_dir: str) -> dict[str, int]:
    con = duckdb.connect()
    docs = os.path.join(sf_dir, "documents.parquet")
    train_filter = (
        "TRUE"
        if os.path.exists(os.path.join(sf_dir, "evalset.parquet"))
        else "doc_id % 97 <> 0"
    )
    row = con.sql(
        f"""
        WITH ids AS (
          SELECT doc_id FROM read_parquet('{docs}') WHERE {train_filter}
        ),
        canon AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 100 = 1 THEN 'https://dupsite.com/shared'
                      ELSE 'https://ex' || CAST(doc_id % 499 AS VARCHAR)
                           || '.com/p/' || CAST(doc_id AS VARCHAR)
                 END AS c,
                 CASE WHEN doc_id % 100 = 1 THEN 'dupsite.com'
                      ELSE 'ex' || CAST(doc_id % 499 AS VARCHAR) || '.com'
                 END AS host
          FROM ids
        ),
        survivors AS (SELECT host, COUNT(DISTINCT c) AS n FROM canon GROUP BY host)
        SELECT (SELECT COUNT(*) - COUNT(DISTINCT c) FROM canon) AS url_dups,
               (SELECT COALESCE(SUM(CASE WHEN n > {CAP} THEN n - {CAP}
                                         ELSE 0 END), 0) FROM survivors)
                 AS domain_capped
        """
    ).fetchone()
    return {"url_dups": int(row[0]), "domain_capped": int(row[1])}


if __name__ == "__main__":
    print(json.dumps(predict(sys.argv[1])))
