"""tools/make_scale_data.py must produce FK-consistent replicas — a
scaling self-run on referentially broken data would silently understate
join work (dropped rows) and overstate dedup work."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from tests.conftest import SF_SMOKE


@pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver-generated testdata absent"
)
def test_replication_preserves_counts_and_fks(tmp_path):
    from make_scale_data import replicate

    out = str(tmp_path / "sf2x")
    replicate(SF_SMOKE, out, factor=2)
    con = duckdb.connect()

    def n(path, t):
        return con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{path}/{t}.parquet')"
        ).fetchone()[0]

    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        assert n(out, t) == 2 * n(SF_SMOKE, t), t
    for t in ("region", "nation"):  # dimensions are not replicated
        assert n(out, t) == n(SF_SMOKE, t), t

    # FK integrity: every replicated order joins a replicated customer,
    # every lineitem joins an order — no rows drop through the join.
    orphans = con.sql(f"""
        SELECT (SELECT COUNT(*) FROM read_parquet('{out}/orders.parquet') o
                LEFT JOIN read_parquet('{out}/customer.parquet') c
                  ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
               (SELECT COUNT(*) FROM read_parquet('{out}/lineitem.parquet') l
                LEFT JOIN read_parquet('{out}/orders.parquet') o
                  ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
    """).fetchone()
    assert orphans == (0, 0)

    # replica documents are near-dups, not byte dups: each replica's "r{i}"
    # prefix makes its texts distinct from the base's, so the distinct
    # count doubles exactly (any exact dups WITHIN the base replicate too)
    def distinct_texts(path):
        return con.sql(
            f"SELECT COUNT(DISTINCT text) "
            f"FROM read_parquet('{path}/documents.parquet') WHERE text IS NOT NULL"
        ).fetchone()[0]

    assert distinct_texts(out) == 2 * distinct_texts(SF_SMOKE)
