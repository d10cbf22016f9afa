"""Build a UNIQUE-TEXT 100x documents replica for the pair-family scale
probes (q106/q108 third-decade evidence).

The standard replica (make_scale_data.py) keeps texts near-identical
across replicas, so every clone group contributes C(replica, 2) TRUE
pairs — output (and wall) grows quadratically in the replica factor BY
CONSTRUCTION, which measures the duplication artifact, not the plan
(the q108 attempt at 100x filled the disk with candidate shuffle).

This variant inserts a replica-salt token after every 2 words (plus a
leading salt), so NO 3-gram shingle is shared across replicas: shingle
df distributions match the 1x corpus per replica, true-pair density is
1x-per-replica, and a probe at 100x measures the LINEAR plan cost —
scan, explode, posting lists, keyed joins — which is the 100 TB
question. Token count grows ~1.5x per doc; compare walls per token.

Writes documents.parquet into OUT and symlinks every other table from
SRC_REPLICA (the clone replica dir), so registry queries run unchanged.

Usage: python tools/make_unique_docs.py /tmp/scale_sf10 /tmp/scale_sf10u 100
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 10_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "embeddings"
).split()


def main(src_sf01: str, clone_dir: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    selects = []
    for i in range(factor):
        salt = f"u{i}q"
        selects.append(
            f"SELECT doc_id + {i * OFFSET} AS doc_id, "
            f"'{salt} ' || REGEXP_REPLACE(text, '(\\S+\\s+\\S+\\s+)', "
            f"'\\1{salt} ', 'g') AS text, "
            f"lang, source, n_chars "
            f"FROM read_parquet('{src_sf01}/documents.parquet')"
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(selects)}) "
        f"TO '{out}/documents.parquet' (FORMAT parquet)"
    )
    n = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    print("documents", n, flush=True)
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{clone_dir}/{t}.parquet", dst)


if __name__ == "__main__":
    argv = sys.argv[1:]
    src = argv[0] if argv else "/root/testdata/sf0.1"
    clone = argv[1] if len(argv) > 1 else "/tmp/scale_sf10"
    out = argv[2] if len(argv) > 2 else "/tmp/scale_sf10u"
    factor = int(argv[3]) if len(argv) > 3 else 100
    main(src, clone, out, factor)
