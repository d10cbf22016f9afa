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
- PLANTED LEAK (``doc_id % 1000 == 500 AND doc_id % 101 != 0`` — always
  clone flavor, disjoint from held-out BY DEFINITION, see
  ``leak_where``): these five source docs' texts ALSO appear in the eval
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

Consequently EVERY gate count at factor f is exactly predictable
(tools/predict_mixed_gates.py): the per-doc gates (c4/repetition/
contamination) scale by f because their flags are replica-invariant,
and the near-dup/output cells — whose banded-minhash collisions are
deterministic md5 functions of the replica bytes — are ENUMERATED via
the shared banded_candidates_ctes scheme + union-find rather than
modeled with the 1−(1−J²)³ recall curve (round-11 verdict #2).
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
LEAK_MOD, LEAK_REM = 1000, 500  # % CLONE_MOD == 0; leak_where() excludes held-out
# PSL-differentiated host family (round-12 verdict #4): the unique-
# flavor slice s % CLONE_MOD == BLOG_REM hosts its pages on
# blog{s % BLOG_HOSTS}.blogspot.co.uk. Under the literal-tuple
# url_domain ALL of them fold into ONE pseudo-domain ('blogspot.co.uk'
# — co.uk is a two-label suffix, so last-3 = blogspot.co.uk) and the
# per-domain cap treats f×~10% of the corpus as one site; under full
# PSL semantics (blogspot.co.uk is an exact PRIVATE rule) each blog is
# its own registrable domain capped individually. Both outcomes are
# closed-form predictable (mixed_domain_sql(psl=...)). BLOG_REM is odd,
# so the www. decoration (even s) never lands on this family.
BLOG_REM = 5
BLOG_HOSTS = 23


def unique_host_sql(s: str) -> str:
    """Host of a UNIQUE-flavor doc with source id expression ``s`` —
    shared by the url/canonical/domain formulas below (one definition)."""
    return (
        f"CASE WHEN ({s}) % {CLONE_MOD} = {BLOG_REM} "
        f"THEN 'blog' || CAST(({s}) % {BLOG_HOSTS} AS VARCHAR) "
        f"|| '.blogspot.co.uk' "
        f"ELSE 'ex' || CAST(({s}) % 499 AS VARCHAR) || '.com' END"
    )


def leak_where(col: str = "doc_id") -> str:
    """Leak predicate — EXPLICITLY disjoint from the held-out predicate.
    By CRT a doc_id ≡ 50500 (mod 101000) satisfies both %1000==500 and
    %101==0; without the exclusion such a doc would sit in the eval set
    as a leak while its train copies are held out of every replica —
    silently un-planting the leak and breaking the n_held + n_leak
    eval-count invariant (ADVICE r11). No row changes at current sf0.1
    ids (max 4999 < 50500); the eval SET is identical either way because
    the OR in mixed_eval_select already absorbed the overlap."""
    return (
        f"({col} % {LEAK_MOD} = {LEAK_REM} "
        f"AND {col} % {HELDOUT_MOD} <> 0)"
    )


def mixed_eval_select(src: str) -> str:
    """SQL for the eval set: held-out docs + the planted leak docs."""
    return (
        f"SELECT * FROM read_parquet('{src}/documents.parquet') "
        f"WHERE doc_id % {HELDOUT_MOD} = 0 "
        f"OR {leak_where()}"
    )


def mixed_url_sql(i: int, col: str = "doc_id") -> str:
    """Native URL expression over SOURCE ids for replica ``i`` (round-11
    verdict #3 — the replica carries its own ``url`` column instead of a
    bench-side synthetic attach). The re-crawl model:

    - CLONE flavor: every replica copy is a tracking-param variant of
      ONE page (``?utm_source=r{i}``) — canonicalization collapses the
      whole f-member family to ``https://clone{s}.com/page``, so URL
      dedup removes the re-crawls BEFORE any content stage;
    - UNIQUE flavor: each copy is its OWN page (replica id in the PATH)
      on host ``ex{s % 499}.com`` — or, for the ``s % 10 == BLOG_REM``
      slice, ``blog{s % 23}.blogspot.co.uk`` (the PSL-differentiated
      family, see BLOG_REM above) — decorated with a variant that
      canonicalizes away (utm param / ``#fragment`` / nothing, cycling
      on ``(s + i) % 3``) plus a ``www.`` prefix for even ``s`` — urls
      differ, canonicals stay distinct, and the per-domain cap gets
      ~f·9 docs per ``ex`` host (and f·~2% of the corpus per blog host,
      or ALL of the blog slice under one key with literal-tuple
      domains) to bite on at decade factors.

    The canonical/domain each URL reduces to is ``mixed_canonical_sql``
    / ``mixed_domain_sql`` — asserted equal to the ENGINE's
    ``canonicalize_url``/``url_domain`` output row-for-row in
    test_make_scale_data.py, so the predictor's formulas cannot drift
    from what the pipeline actually computes."""
    clone = (
        f"'https://clone' || CAST({col} AS VARCHAR) || "
        f"'.com/page?utm_source=r{i}'"
    )
    deco = (
        f"CASE ({col} + {i}) % 3 WHEN 0 THEN '?utm_source=feed' "
        f"WHEN 1 THEN '#sec2' ELSE '' END"
    )
    www = f"CASE WHEN {col} % 2 = 0 THEN 'https://www.' ELSE 'https://' END"
    unique = (
        f"({www}) || ({unique_host_sql(col)}) || '/p/' || "
        f"CAST({col} AS VARCHAR) || '/r{i}' || ({deco})"
    )
    return f"CASE WHEN {col} % {CLONE_MOD} = 0 THEN {clone} ELSE {unique} END"


def mixed_canonical_sql(col: str = "doc_id") -> str:
    """Canonical URL of a SHIFTED mixed doc_id (s = %OFFSET, i =
    //OFFSET) — what ``canonicalize_url`` produces on ``mixed_url_sql``
    strings (engine-asserted, see mixed_url_sql docstring)."""
    s = f"({col} % {OFFSET})"
    i = f"({col} // {OFFSET})"
    clone = f"'https://clone' || CAST({s} AS VARCHAR) || '.com/page'"
    unique = (
        f"'https://' || ({unique_host_sql(s)}) || '/p/' || "
        f"CAST({s} AS VARCHAR) || '/r' || CAST({i} AS VARCHAR)"
    )
    return f"CASE WHEN {col} % {CLONE_MOD} = 0 THEN {clone} ELSE {unique} END"


def mixed_domain_sql(col: str = "doc_id", psl: bool = False) -> str:
    """Registered domain of a SHIFTED mixed doc_id — what ``url_domain``
    (``psl=False``) or ``url_domain_psl`` with a PSL file that passes
    ``predict_mixed_gates.assert_psl_closed_form`` (``psl=True``)
    produces on the canonical (engine-asserted alongside the above,
    both variants). The two differ ONLY on the blog family: literal
    tuple folds every blog under 'blogspot.co.uk'; PSL keeps each
    blog{k}.blogspot.co.uk its own registrable domain."""
    s = f"({col} % {OFFSET})"
    blog_domain = (
        f"'blog' || CAST({s} % {BLOG_HOSTS} AS VARCHAR) "
        f"|| '.blogspot.co.uk'"
        if psl
        else "'blogspot.co.uk'"
    )
    return (
        f"CASE WHEN {col} % {CLONE_MOD} = 0 "
        f"THEN 'clone' || CAST({s} AS VARCHAR) || '.com' "
        f"WHEN {col} % {CLONE_MOD} = {BLOG_REM} THEN {blog_domain} "
        f"ELSE 'ex' || CAST({s} % 499 AS VARCHAR) || '.com' END"
    )


def mixed_doc_select(src: str, i: int) -> str:
    """SQL for replica ``i``'s documents (held-out rows excluded).
    References to raw ``doc_id`` inside the projection bind to the BASE
    column, not the shifted alias (DuckDB table-column precedence), so
    the url/text expressions see SOURCE ids."""
    suffix = f"x{i}"
    unique_text = (
        f"REGEXP_REPLACE(text, '(\\S+)', '\\1{suffix}', 'g')"
    )
    return (
        f"SELECT doc_id + {i * OFFSET} AS doc_id, "
        f"CASE WHEN doc_id % {CLONE_MOD} = 0 THEN text "
        f"ELSE {unique_text} END AS text, "
        f"lang, source, n_chars, "
        f"{mixed_url_sql(i)} AS url "
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
