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

MIXED mode (round-10 verdict #2 — a replica whose curation-gate
decisions are non-degenerate AND predictable from a one-replica probe):

    python tools/make_scale_data.py --mixed SRC_SF01 CLONE_DIR OUT FACTOR

Writes a documents.parquet where per-source-doc flavor is deterministic:

- HELD-OUT eval (``doc_id % 101 == 0``): excluded from every replica,
  written as ``OUT/evalset.parquet`` with original text — the eval set
  is disjoint from train by construction (the clone replica's
  everything-contaminated collapse cannot happen);
- PLANTED LEAK (``doc_id % 1000 == 500`` — always clone flavor, never
  held out): these five source docs' texts ALSO appear in the eval
  set while their byte-identical copies stay in train, so the
  decontamination gate fires a predictable, nonzero number of times
  (f × the one-replica overlap) instead of measuring a degenerate 0;
- CLONE flavor (``doc_id % 10 == 0``): replica text = source text,
  BYTE-IDENTICAL (the re-crawl model) — every source doc yields one
  FACTOR-member duplicate family with cross-replica jaccard exactly 1,
  so family structure at factor f is exactly the probe's component
  structure (a glued marker variant was considered and rejected: it
  perturbs cross-SOURCE jaccards near the 0.8 threshold, which breaks
  exact predictability for borderline 1x pairs), and every per-doc
  gate outcome is replica-invariant trivially;
- UNIQUE flavor (the rest): EVERY token gets an ``x{i}`` suffix —
  within-doc token/bigram relative frequencies, word counts and
  within-replica jaccard structure are preserved exactly, while NO
  shingle is shared across replicas (and none with the clone flavor's
  unsuffixed vocabulary).

Consequently each gate's expected count at factor f is an exact
function of one-replica probes (tools/predict_mixed_gates.py computes
them): c4/repetition scale by f; near-dups are f·(n_u − comp_u) +
f·n_c − comp_c (component counts of the two 1× flavor subgraphs);
contamination is f × the clone-subset overlap with the held-out docs.
Non-document tables symlink to CLONE_DIR (the same-factor clone
replica), like make_unique_docs.py.
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


# Flavor predicates + transforms shared with tools/predict_mixed_gates.py
# (ONE definition of the mixed-replica construction).
HELDOUT_MOD = 101
CLONE_MOD = 10
LEAK_MOD, LEAK_REM = 1000, 500  # % CLONE_MOD == 0 and never held out


def mixed_eval_select(src: str) -> str:
    """SQL for the eval set: held-out docs + the planted leak docs."""
    return (
        f"SELECT * FROM read_parquet('{src}/documents.parquet') "
        f"WHERE doc_id % {HELDOUT_MOD} = 0 "
        f"OR doc_id % {LEAK_MOD} = {LEAK_REM}"
    )


def mixed_doc_select(src: str, i: int) -> str:
    """SQL for replica ``i``'s documents (held-out rows excluded)."""
    suffix = f"x{i}"
    unique_text = (
        f"REGEXP_REPLACE(text, '(\\S+)', '\\1{suffix}', 'g')"
    )
    return (
        f"SELECT doc_id + {i * OFFSET} AS doc_id, "
        f"CASE WHEN doc_id % {CLONE_MOD} = 0 THEN text "
        f"ELSE {unique_text} END AS text, "
        f"lang, source, n_chars "
        f"FROM read_parquet('{src}/documents.parquet') "
        f"WHERE doc_id % {HELDOUT_MOD} <> 0"
    )


def make_mixed(src: str, clone_dir: str, out: str, factor: int) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    selects = [mixed_doc_select(src, i) for i in range(factor)]
    con.sql(
        f"COPY ({' UNION ALL '.join(selects)}) "
        f"TO '{out}/documents.parquet' (FORMAT parquet)"
    )
    con.sql(
        f"COPY ({mixed_eval_select(src)}) "
        f"TO '{out}/evalset.parquet' (FORMAT parquet)"
    )
    for t in list(_PLAN) + list(_DIMS):
        if t == "documents":
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{clone_dir}/{t}.parquet", dst)
    for name in ("documents", "evalset"):
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')"
        ).fetchone()[0]
        print(name, n, flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--mixed":
        make_mixed(argv[1], argv[2], argv[3], int(argv[4]))
    else:
        src = argv[0] if argv else "/root/testdata/sf0.1"
        out = argv[1] if len(argv) > 1 else "/tmp/scale_sf1"
        factor = int(argv[2]) if len(argv) > 2 else 10
        replicate(src, out, factor)
