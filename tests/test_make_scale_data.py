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


@pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver-generated testdata absent"
)
def test_mixed_mode_construction_invariants(tmp_path):
    """Mixed mode (round-10 verdict #2): held-out docs excluded from
    every replica; clone-flavor members byte-identical across replicas;
    unique-flavor docs share NO token across replicas (suffix bijection)
    while preserving per-doc word counts; eval = held-out + planted
    leak docs whose byte-identical copies stay in train."""
    from make_scale_data import (
        CLONE_MOD,
        HELDOUT_MOD,
        OFFSET,
        leak_where,
        make_mixed,
    )

    clone_dir = str(tmp_path / "clone")
    os.makedirs(clone_dir)
    # cheap stand-in clone dir: symlink targets only need to exist
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{clone_dir}/{t}.parquet")
    out = str(tmp_path / "mixed")
    make_mixed(SF_SMOKE, clone_dir, out, factor=3)
    con = duckdb.connect()
    docs = f"read_parquet('{out}/documents.parquet')"
    ev = f"read_parquet('{out}/evalset.parquet')"
    src = f"read_parquet('{SF_SMOKE}/documents.parquet')"

    n_src, n_held, n_leak = con.sql(
        f"SELECT COUNT(*), "
        f"COUNT(*) FILTER (doc_id % {HELDOUT_MOD} = 0), "
        f"COUNT(*) FILTER ({leak_where()}) FROM {src}"
    ).fetchone()
    assert con.sql(f"SELECT COUNT(*) FROM {docs}").fetchone()[0] == 3 * (
        n_src - n_held
    )
    assert con.sql(f"SELECT COUNT(*) FROM {ev}").fetchone()[0] == (
        n_held + n_leak
    )
    # no held-out doc in any replica
    assert con.sql(
        f"SELECT COUNT(*) FROM {docs} "
        f"WHERE (doc_id % {OFFSET}) % {HELDOUT_MOD} = 0"
    ).fetchone()[0] == 0
    # clone flavor: replicas byte-identical to source
    assert con.sql(
        f"SELECT COUNT(*) FROM {docs} d JOIN {src} s "
        f"ON d.doc_id % {OFFSET} = s.doc_id "
        f"WHERE d.doc_id % {CLONE_MOD} = 0 AND d.text <> s.text"
    ).fetchone()[0] == 0
    # unique flavor: zero shared tokens across replicas, word count kept
    shared = con.sql(f"""
        WITH tok AS (
          SELECT doc_id // {OFFSET} AS rep, UNNEST(
            REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS t
          FROM {docs} WHERE doc_id % {CLONE_MOD} <> 0
        )
        SELECT COUNT(*) FROM (
          SELECT t FROM tok GROUP BY t HAVING COUNT(DISTINCT rep) > 1
        )
    """).fetchone()[0]
    assert shared == 0
    words_kept = con.sql(f"""
        SELECT COUNT(*) FROM {docs} d JOIN {src} s
          ON d.doc_id % {OFFSET} = s.doc_id
        WHERE d.doc_id % {CLONE_MOD} <> 0
          AND ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(d.text), '\\s+'))
           <> ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(s.text), '\\s+'))
    """).fetchone()[0]
    assert words_kept == 0
    # planted leak: eval texts byte-present in train (clone flavor)
    leaked_in_train = con.sql(f"""
        SELECT COUNT(DISTINCT e.doc_id) FROM {ev} e JOIN {docs} d
          ON e.text = d.text
        WHERE {leak_where('e.doc_id')}
    """).fetchone()[0]
    assert leaked_in_train == n_leak


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.01"),
    reason="driver-generated testdata absent",
)
def test_predict_mixed_gates_exact_at_factor_3(tmp_path, spark):
    """Round-11 verdict #2: EVERY predicted gate count — including
    near_dups and output, previously a ±0.2% banding-recall band — must
    match the measured pipeline EXACTLY. The predictor enumerates the
    band-collision set via the shared banded_candidates_ctes scheme +
    union-find instead of the 1−(1−J²)³ recall model."""
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
        run_curation_pipeline,
    )
    from make_scale_data import make_mixed
    from predict_mixed_gates import predict

    src = "/root/testdata/sf0.01"
    clone_dir = str(tmp_path / "clone")
    os.makedirs(clone_dir)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{src}/{t}.parquet", f"{clone_dir}/{t}.parquet")
    out = str(tmp_path / "mixed")
    make_mixed(src, clone_dir, out, factor=3)

    dot = lambda df: df.select(
        "doc_id", F.concat(F.col("text"), F.lit(".")).alias("text")
    )
    train = dot(spark.read.parquet(f"{out}/documents.parquet"))
    evalset = dot(spark.read.parquet(f"{out}/evalset.parquet"))
    measured = run_curation_pipeline(
        spark, train, str(tmp_path / "gold"), evalset=evalset
    )
    predicted = predict(src, 3)
    assert predicted["exact"] is True
    for k in (
        "input",
        "failed_c4",
        "failed_repetition",
        "near_dups",
        "contaminated",
        "output",
    ):
        assert measured[k] == predicted["predicted"][k], (
            k,
            measured[k],
            predicted["predicted"][k],
        )


@pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver-generated testdata absent"
)
def test_mixed_native_url_matches_engine_canonicalization(tmp_path, spark):
    """Round-11 verdict #3: the mixed replica's native url column must
    reduce — through the ENGINE's canonicalize_url/url_domain — to
    exactly the formulas the predictor uses (mixed_canonical_sql /
    mixed_domain_sql), row for row. This is the one-definition guard:
    if the URL construction or the canonicalizer changes, this test
    breaks before the decade ground truth silently drifts."""
    from pyspark.sql import functions as F

    from make_scale_data import (
        make_mixed,
        mixed_canonical_sql,
        mixed_domain_sql,
    )
    from nahuatl_data_pipeline_spark.functions.url import (
        canonicalize_url,
        url_domain,
    )

    clone_dir = str(tmp_path / "clone")
    os.makedirs(clone_dir)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{clone_dir}/{t}.parquet")
    out = str(tmp_path / "mixed")
    make_mixed(SF_SMOKE, clone_dir, out, factor=3)

    engine = {
        int(r["doc_id"]): (r["canon"], r["dom"])
        for r in spark.read.parquet(f"{out}/documents.parquet")
        .select(
            "doc_id",
            canonicalize_url(F.col("url")).alias("canon"),
            url_domain(canonicalize_url(F.col("url"))).alias("dom"),
        )
        .collect()
    }
    con = duckdb.connect()
    formula = {
        int(d): (c, h)
        for d, c, h in con.sql(
            f"SELECT doc_id, {mixed_canonical_sql()}, {mixed_domain_sql()} "
            f"FROM read_parquet('{out}/documents.parquet')"
        ).fetchall()
    }
    assert engine == formula
    # both flavors and all three decoration branches are present
    urls = [
        r["url"]
        for r in spark.read.parquet(f"{out}/documents.parquet")
        .select("url")
        .collect()
    ]
    assert any("clone" in u for u in urls)
    assert any("utm_source=feed" in u for u in urls)
    assert any("#sec2" in u for u in urls)
    assert any("www." in u for u in urls)


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.01"),
    reason="driver-generated testdata absent",
)
def test_predict_mixed_gates_url_stages_exact(tmp_path, spark):
    """Full-stack exact ground truth (round-11 verdict #3): with the
    URL head stages ON (native url column, cap small enough to bite at
    factor 3), EVERY stat — url_dups, domain_capped, and all content
    gates computed over the survivor corpus — must match the measured
    pipeline exactly."""
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
        CurationConfig,
        run_curation_pipeline,
    )
    from make_scale_data import make_mixed
    from predict_mixed_gates import predict

    src = "/root/testdata/sf0.01"
    clone_dir = str(tmp_path / "clone")
    os.makedirs(clone_dir)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{src}/{t}.parquet", f"{clone_dir}/{t}.parquet")
    out = str(tmp_path / "mixed")
    make_mixed(src, clone_dir, out, factor=3)

    train = spark.read.parquet(f"{out}/documents.parquet").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(".")).alias("text"),
        "url",
    )
    evalset = spark.read.parquet(f"{out}/evalset.parquet").select(
        "doc_id", F.concat(F.col("text"), F.lit(".")).alias("text")
    )
    cfg = CurationConfig(
        fix_encoding=True, url_col="url", max_docs_per_domain=2
    )
    measured = run_curation_pipeline(
        spark, train, str(tmp_path / "gold"), evalset=evalset, cfg=cfg
    )
    predicted = predict(src, 3, url_stages=True, cap=2)["predicted"]
    # the cap must actually bite for this test to mean anything
    assert predicted["domain_capped"] > 0
    assert predicted["url_dups"] > 0
    for k in (
        "input",
        "url_dups",
        "domain_capped",
        "failed_c4",
        "failed_repetition",
        "near_dups",
        "contaminated",
        "output",
    ):
        assert measured[k] == predicted[k], (k, measured[k], predicted[k])


_PSL_SNAPSHOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "public_suffix_snapshot.dat",
)


@pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver-generated testdata absent"
)
def test_mixed_native_url_matches_engine_psl_domain(tmp_path, spark):
    """Round-12 verdict #4, one-definition guard for the PSL cap path:
    the mixed replica's native url column must reduce — through the
    ENGINE's url_domain_psl under the committed realistic-scale
    snapshot — to exactly mixed_domain_sql(psl=True), row for row
    (blog family split per-blog, everything else as the literal
    formula), and the blog family must actually differ between the
    literal and PSL formulas (else the planted truth certifies
    nothing)."""
    from pyspark.sql import functions as F

    from make_scale_data import (
        BLOG_REM,
        CLONE_MOD,
        make_mixed,
        mixed_domain_sql,
    )
    from nahuatl_data_pipeline_spark.functions.url import (
        canonicalize_url,
        load_public_suffix_list,
        url_domain_psl,
    )

    clone_dir = str(tmp_path / "clone")
    os.makedirs(clone_dir)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{clone_dir}/{t}.parquet")
    out = str(tmp_path / "mixed")
    make_mixed(SF_SMOKE, clone_dir, out, factor=3)

    rules = load_public_suffix_list(_PSL_SNAPSHOT)
    base = spark.read.parquet(f"{out}/documents.parquet").withColumn(
        "__c", canonicalize_url(F.col("url"))
    )
    engine = {
        int(r["doc_id"]): r["dom"]
        for r in url_domain_psl(base, "__c", rules, out_col="dom")
        .select("doc_id", "dom")
        .collect()
    }
    con = duckdb.connect()
    formula = {
        int(d): h
        for d, h in con.sql(
            f"SELECT doc_id, {mixed_domain_sql(psl=True)} "
            f"FROM read_parquet('{out}/documents.parquet')"
        ).fetchall()
    }
    assert engine == formula
    # the literal and PSL formulas genuinely diverge on the blog slice
    n_blog, n_diverge = con.sql(
        f"""SELECT COUNT(*) FILTER (doc_id % {CLONE_MOD} = {BLOG_REM}),
               COUNT(*) FILTER ({mixed_domain_sql(psl=True)}
                                <> {mixed_domain_sql(psl=False)})
        FROM read_parquet('{out}/documents.parquet')"""
    ).fetchone()
    assert n_blog > 0 and n_diverge == n_blog


def test_assert_psl_closed_form_rejects_interfering_rules():
    from predict_mixed_gates import assert_psl_closed_form

    ok = {"exact": ["com", "blogspot.co.uk", "co.uk"],
          "wildcard": ["ck"], "exception": ["www.ck"]}
    assert_psl_closed_form(ok)  # no raise
    import copy

    for mutate in (
        lambda r: r["exact"].remove("com"),
        lambda r: r["exact"].remove("blogspot.co.uk"),
        lambda r: r["wildcard"].append("com"),
        lambda r: r["wildcard"].append("blogspot.co.uk"),
        lambda r: r["exact"].append("ex42.com"),
        lambda r: r["exception"].append("blog3.blogspot.co.uk"),
        # parent-suffix EXCEPTIONS re-resolve planted hosts outright
        # (exception wins, suffix = rule minus leftmost label) —
        # self-review r13: these previously slipped through
        lambda r: r["exception"].append("com"),
        lambda r: r["exception"].append("blogspot.co.uk"),
        lambda r: r["exception"].append("co.uk"),
        lambda r: r["exception"].append("uk"),
    ):
        bad = copy.deepcopy(ok)
        mutate(bad)
        with pytest.raises(AssertionError):
            assert_psl_closed_form(bad)


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.01"),
    reason="driver-generated testdata absent",
)
def test_predict_mixed_gates_url_stages_psl_exact(tmp_path, spark):
    """Full-stack exact ground truth for the PSL cap path (round-12
    verdict #4): with the URL head stages ON and the cap keyed by
    url_domain_psl under the committed snapshot, EVERY stat must match
    the measured pipeline exactly — and the PSL run must cap LESS than
    the literal run at the same cap (each blog is its own domain
    instead of one folded pseudo-domain), so the path being certified
    is demonstrably the PSL one."""
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.plans.curation_pipeline import (
        CurationConfig,
        run_curation_pipeline,
    )
    from nahuatl_data_pipeline_spark.functions.url import (
        load_public_suffix_list,
    )
    from make_scale_data import make_mixed
    from predict_mixed_gates import predict

    src = "/root/testdata/sf0.01"
    clone_dir = str(tmp_path / "clone")
    os.makedirs(clone_dir)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{src}/{t}.parquet", f"{clone_dir}/{t}.parquet")
    out = str(tmp_path / "mixed")
    make_mixed(src, clone_dir, out, factor=3)

    train = spark.read.parquet(f"{out}/documents.parquet").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(".")).alias("text"),
        "url",
    )
    evalset = spark.read.parquet(f"{out}/evalset.parquet").select(
        "doc_id", F.concat(F.col("text"), F.lit(".")).alias("text")
    )
    cfg = CurationConfig(
        fix_encoding=True, url_col="url", max_docs_per_domain=2,
        psl_rules=load_public_suffix_list(_PSL_SNAPSHOT),
    )
    measured = run_curation_pipeline(
        spark, train, str(tmp_path / "gold"), evalset=evalset, cfg=cfg
    )
    predicted = predict(
        src, 3, url_stages=True, cap=2, psl_file=_PSL_SNAPSHOT
    )["predicted"]
    assert predicted["domain_capped"] > 0
    for k in (
        "input",
        "url_dups",
        "domain_capped",
        "failed_c4",
        "failed_repetition",
        "near_dups",
        "contaminated",
        "output",
    ):
        assert measured[k] == predicted[k], (k, measured[k], predicted[k])
    literal = predict(src, 3, url_stages=True, cap=2)["predicted"]
    assert literal["domain_capped"] > predicted["domain_capped"]
