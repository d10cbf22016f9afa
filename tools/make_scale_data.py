"""Build an sf1-equivalent testdata dir by FK-consistent 10x replication
of the driver-generated sf0.1 parquet (SCALE.md self-run; we cannot
write /root/testdata, and the brief's rule is to derive inputs from the
driver's tables rather than synthesize distributions from scratch).

Each replica i shifts every entity key by i*OFFSET so joins stay
referentially intact (orders->customer, lineitem->orders/part/supplier,
events->user). Dimension tables (region, nation) are NOT replicated —
at 100 TB dimensions grow with entities, not events, which is exactly
why the engine broadcasts them. Replica documents get a distinct "r{i}"
prefix token: texts stay NEAR-duplicates (not byte-exact), which is the
honest stress for LSH/banded candidate growth and cluster dedup.

Usage: python tools/make_scale_data.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import sys

import duckdb

OFFSET = 10_000_000

# table -> (key columns to shift, text column to prefix or None)
_PLAN: dict[str, tuple[list[str], str | None]] = {
    "customer": (["c_custkey"], None),
    "supplier": (["s_suppkey"], None),
    "part": (["p_partkey"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], None),
    "events": (["event_id", "user_id"], None),
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
}
_DIMS = ("region", "nation")


def replicate(src: str, out: str, factor: int = 10) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in _DIMS:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
    for t, (keys, text_col) in _PLAN.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(factor):
            proj = []
            for c in cols:
                if c in keys:
                    proj.append(f"{c} + {i * OFFSET} AS {c}")
                elif c == text_col and i > 0:
                    proj.append(f"'r{i} ' || {c} AS {c}")
                else:
                    proj.append(c)
            selects.append(
                f"SELECT {', '.join(proj)} "
                f"FROM read_parquet('{src}/{t}.parquet')"
            )
        con.sql(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(t, n, flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    src = argv[0] if argv else "/root/testdata/sf0.1"
    out = argv[1] if len(argv) > 1 else "/tmp/scale_sf1"
    factor = int(argv[2]) if len(argv) > 2 else 10
    replicate(src, out, factor)
