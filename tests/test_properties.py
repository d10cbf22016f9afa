"""Property-based invariants (hypothesis): normalization idempotence,
dedup idempotence/partition-independence, split totality — batched into
one Spark DataFrame per example to keep runtime sane."""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.normalize import normalize_text
from nahuatl_data_pipeline_spark.operators.dedup import deduplicate
from nahuatl_data_pipeline_spark.operators.split import seeded_split

# text with the alphabets that matter: ascii, macrons, saltillo variants,
# Maya ejectives, Spanish punctuation, whitespace runs
TEXT = st.text(
    alphabet=st.sampled_from(list("abctlzk xyz āēīōū ʼ'’`ʔ ñ¿¡ ,.; \t\n")),
    min_size=0,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=12))
def test_normalize_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x) for every language chain."""
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    for lang in (None, "nah", "myn", "es"):
        once = df.select(normalize_text(F.col("t"), lang=lang).alias("o"))
        twice = once.select(normalize_text(F.col("o"), lang=lang).alias("o"))
        assert [r["o"] for r in once.collect()] == [
            r["o"] for r in twice.collect()
        ]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(TEXT, TEXT, st.sampled_from(["silver", "diamond"])),
        min_size=1,
        max_size=20,
    )
)
def test_dedup_idempotent_and_partition_stable(spark, rows):
    df = spark.createDataFrame(
        [(es, nah, None, "s", layer) for es, nah, layer in rows],
        "es string, nah string, myn string, source string, layer string",
    )
    once = deduplicate(df, keep="best")
    # idempotent: dedup of deduped output changes nothing
    assert sorted(map(tuple, deduplicate(once, keep="best").collect())) == sorted(
        map(tuple, once.collect())
    )
    # partition-independent
    assert sorted(map(tuple, deduplicate(df.repartition(5), keep="best").collect())) == sorted(
        map(tuple, once.collect())
    )


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=1, max_value=200))
def test_split_exact_and_total(spark, n):
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = seeded_split(df, "doc_id", seed=42)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # total: every row assigned exactly once
    assert counts.get("train", 0) == int(n * 0.9)  # exact floor cutoffs
    train_plus_val = int(n * 0.95)
    assert counts.get("train", 0) + counts.get("validation", 0) == train_plus_val


@settings(max_examples=10, deadline=None)
@given(
    st.lists(  # points: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1, max_size=20,
    ),
    st.lists(  # right side: (key, ts, val) — deduped per (key, ts) below
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=0, max_size=15,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, pts, rhs):
    """asof_join == pandas.merge_asof(by=key, direction='backward') on
    arbitrary data — the union+forward-fill window must reproduce the
    reference single-node semantics exactly."""
    import pandas as pd

    from nahuatl_data_pipeline_spark.operators.asof import asof_join

    lpdf = pd.DataFrame(pts, columns=["k", "ts"]).assign(
        pid=lambda d: range(len(d))
    )
    rpdf = (
        pd.DataFrame(rhs, columns=["k", "ts", "val"])
        .groupby(["k", "ts"], as_index=False)["val"].max()
        .astype({"k": "int64", "ts": "int64", "val": "int64"})
    )
    left = spark.createDataFrame(lpdf, schema="k int, ts int, pid int")
    right = (
        spark.createDataFrame(rpdf, schema="k int, ts int, val int")
        if len(rpdf)
        else spark.createDataFrame([], "k int, ts int, val int")
    )
    got = {
        r["pid"]: r["val"]
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    expected_df = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward",
    )
    expected = {
        int(r.pid): (None if pd.isna(r.val) else int(r.val))
        for r in expected_df.itertuples()
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(  # base snapshot: unique keys with (attr, tracked val)
        st.tuples(st.integers(0, 30), st.integers(0, 3)),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.lists(  # update batch: unique keys, possibly overlapping base
        st.tuples(st.integers(0, 40), st.integers(0, 3)),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
def test_scd2_merge_matches_dict_model(spark, base_rows, upd_rows):
    """scd2_merge == the obvious single-threaded dict model: changed
    keys get (v1 history, v2 current), no-ops and untouched keys keep
    one current v1, new keys insert one current v2."""
    from nahuatl_data_pipeline_spark.operators.merge import scd2_merge

    base = spark.createDataFrame(
        [(k, float(v)) for k, v in base_rows], "k long, val double"
    )
    upd = spark.createDataFrame(
        [(k, float(v)) for k, v in upd_rows], "k long, val double"
    )
    got = sorted(
        map(
            tuple,
            scd2_merge(base, upd, keys=["k"], tracked=["val"])
            .select("k", "val", "version", "is_current")
            .collect(),
        )
    )
    b, u = dict(base_rows), dict(upd_rows)
    want = []
    for k, v in b.items():
        changed = k in u and u[k] != v
        want.append((k, float(v), 1, not changed))
        if changed:
            want.append((k, float(u[k]), 2, True))
    for k, v in u.items():
        if k not in b:
            want.append((k, float(v), 2, True))
    assert got == sorted(want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(TEXT, min_size=1, max_size=10),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=3),
)
def test_chunk_windows_reconstruct_token_stream(spark, texts, chunk, ov):
    """Dropping each window's leading `overlap` tokens (except window 0)
    and concatenating reconstructs the document's token stream exactly —
    full coverage, no duplication, for ANY text/chunk/overlap combo."""
    from nahuatl_data_pipeline_spark.functions.segmentation import (
        token_window_chunks,
    )

    if ov >= chunk:
        ov = chunk - 1
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = token_window_chunks(df, "doc_id", "text", chunk, ov).collect()
    got: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        assert len(toks) == r["n_tokens"]
        assert 1 <= r["n_tokens"] <= chunk
        got.setdefault(r["doc_id"], []).extend(
            toks if r["chunk_idx"] == 0 else toks[ov:]
        )
    for i, t in enumerate(texts):
        want = t.split()
        if want:
            assert got[i] == want, (t, chunk, ov)
        else:
            assert i not in got


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    st.integers(min_value=0, max_value=60_000),
)
def test_water_fill_properties(spark, avails, budget):
    """Σ alloc == min(budget, Σ avail) (up to level rounding), every
    alloc ∈ [0, avail], and fully-funded sources are exactly those at
    or below the level."""
    from nahuatl_data_pipeline_spark.operators.mixing import water_fill

    df = spark.createDataFrame(
        [(f"s{i}", a) for i, a in enumerate(avails)], "k string, a long"
    )
    rows = water_fill(df, "k", "a", budget).collect()
    total = sum(avails)
    allocs = {r["k"]: r["alloc"] for r in rows}
    assert len(allocs) == len(avails)
    s = sum(allocs.values())
    assert abs(s - min(budget, total)) <= 1e-3 * max(1, len(avails))
    for r in rows:
        assert -1e-9 <= r["alloc"] <= r["avail"] + 1e-9


# URL-ish strings: schemes, authorities (userinfo/port), paths, query
# params (tracking + real), fragments, junk — the shapes a crawl feed
# actually contains.
_URLISH = st.lists(
    st.sampled_from(
        list("abcXYZ09:/?#&=._-@%~ []")
        + [
            "https://", "HTTP://", "www.", "utm_a=1", "co.uk", "?a=1&b=2",
            # hostile-authority shapes the r11 hardening targets:
            # userinfo (incl. double-@), bracket literals, ports
            "u@", "u@x@", "[::1]", "[::ffff:192.168.0.1]", ":80", ":8080",
            "192.168.0.1",
        ]
    ),
    min_size=0,
    max_size=8,
).map("".join)


@settings(max_examples=12, deadline=None)
@given(st.lists(_URLISH, min_size=1, max_size=16))
@example(["a /"])  # r11: slash-strip exposed edge whitespace
@example(["http://a.com:80 /x", "a / / /"])  # authority-space variants
def test_canonicalize_url_idempotent_and_domain_stable(spark, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u) — the canonical
    form must be a fixed point (otherwise two dedup passes disagree on
    keys); and url_domain of a canonical url must equal url_domain of
    the re-canonicalized url (domain stats computed before or after URL
    dedup see the same domains)."""
    from nahuatl_data_pipeline_spark.functions.url import (
        canonicalize_url,
        url_domain,
    )

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    out = once.select(
        "c",
        canonicalize_url(F.col("c")).alias("cc"),
        url_domain(F.col("c")).alias("d"),
    ).collect()
    for r in out:
        assert r.cc == r.c, (r.c, r.cc)
    twice_dom = once.select(
        url_domain(canonicalize_url(F.col("c"))).alias("d")
    ).collect()
    assert [r.d for r in out] == [r.d for r in twice_dom]
