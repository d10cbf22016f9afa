"""tf-idf unit tests (operators/tfidf.py): hand-computed scores,
deterministic tie-breaks, and the no-driver-scalar plan contract."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.tfidf import tfidf_top_terms, tokenize


def _docs(spark, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf, schema="doc_id long, text string")


def test_tokenize_drops_empties(spark):
    docs = _docs(spark, [(1, "a  b "), (2, "")])
    got = sorted(map(tuple, tokenize(docs, "doc_id", "text").collect()))
    assert got == [(1, "a"), (1, "b")]


def test_scores_hand_computed(spark):
    # 3 docs; "rare" appears twice in doc 1 only; "common" in all three.
    docs = _docs(
        spark,
        [
            (1, "rare rare common"),
            (2, "common x"),
            (3, "common y"),
        ],
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=3)
    d1 = {r["term"]: r for r in out.filter(F.col("doc_id") == 1).collect()}
    assert d1["rare"]["tf"] == 2 and d1["rare"]["df"] == 1
    assert d1["rare"]["score"] == round(2 * math.log((1 + 3) / (1 + 1)), 6)
    assert d1["common"]["score"] == round(1 * math.log((1 + 3) / (1 + 3)), 6) == 0.0
    # rare ranks above common in doc 1
    assert d1["rare"]["rank"] < d1["common"]["rank"]


def test_ties_break_by_term_ascending(spark):
    docs = _docs(spark, [(1, "b a"), (2, "a b")])  # identical tf and df
    out = tfidf_top_terms(docs, "doc_id", "text", k=1)
    got = {r["doc_id"]: r["term"] for r in out.collect()}
    assert got == {1: "a", 2: "a"}


def test_corpus_size_stays_distributed(spark):
    """N rides a broadcast 1-row aggregate — no collect()/driver scalar
    baked into the plan (the plan must contain the N-side aggregate)."""
    docs = _docs(spark, [(1, "a b"), (2, "b c")])
    out = tfidf_top_terms(docs, "doc_id", "text", k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row N crossJoin
    assert out.count() == 4


# ---------------------------------------------------------------------------
# vocab_growth
# ---------------------------------------------------------------------------


def test_vocab_growth_hand_computed(spark):
    """docs 0,1 in bucket 0 introduce {a,b,c}; doc 2 in bucket 1 adds
    {d} (repeats of a/b count nowhere); bucket 2 adds nothing → no row
    (no first occurrences there), doc 5 adds {e} in bucket 2."""
    from nahuatl_data_pipeline_spark.operators.tfidf import vocab_growth

    docs = spark.createDataFrame(
        [
            (0, "a b"),
            (1, "b c"),
            (2, "a d b"),
            (5, "e a"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["bucket"]: (r["docs_seen"], r["new_types"], r["cum_types"])
        for r in vocab_growth(docs, "doc_id", "text", bucket_docs=2).collect()
    }
    assert out == {0: (2, 3, 3), 1: (4, 1, 4), 2: (6, 1, 5)}


def test_vocab_growth_monotone_and_totals(spark):
    from nahuatl_data_pipeline_spark.operators.tfidf import vocab_growth

    docs = spark.createDataFrame(
        [(i, f"tok{i % 37} tok{i % 11} common") for i in range(200)],
        ["doc_id", "text"],
    )
    rows = sorted(
        vocab_growth(docs, "doc_id", "text", bucket_docs=50).collect(),
        key=lambda r: r["bucket"],
    )
    cums = [r["cum_types"] for r in rows]
    assert cums == sorted(cums)  # monotone
    # tok0..tok10 from the %11 set are all inside the %37 set → 37+1 types
    assert cums[-1] == 37 + 1


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs
# ---------------------------------------------------------------------------


def test_cosine_pairs_identical_docs_score_one(spark):
    from nahuatl_data_pipeline_spark.operators.tfidf import (
        tfidf_cosine_pairs,
    )

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "epsilon zeta eta theta"),
        ],
    )
    got = tfidf_cosine_pairs(docs, "doc_id", "text", df_cap=10,
                             threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["cosine"]) for r in got] == [(1, 2, 1.0)]


def test_cosine_pairs_df_cap_sheds_stop_terms(spark):
    """'common' appears in every doc; with df_cap below the corpus size
    it is shed from the index, so docs sharing ONLY that term produce
    no pair at all (their capped vectors are orthogonal)."""
    from nahuatl_data_pipeline_spark.operators.tfidf import (
        tfidf_cosine_pairs,
    )

    docs = _docs(
        spark,
        [
            (1, "common unique1 unique2"),
            (2, "common unique3 unique4"),
            (3, "common unique5 unique6"),
        ],
    )
    assert (
        tfidf_cosine_pairs(
            docs, "doc_id", "text", df_cap=2, threshold=0.01
        ).count()
        == 0
    )


def test_cosine_pairs_symmetric_ordering_and_bounds(spark):
    from nahuatl_data_pipeline_spark.operators.tfidf import (
        tfidf_cosine_pairs,
    )

    docs = _docs(
        spark,
        [(i, f"shared word tok{i} tok{i + 1} tok{i + 2}") for i in range(8)],
    )
    rows = tfidf_cosine_pairs(
        docs, "doc_id", "text", df_cap=8, threshold=0.05
    ).collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0.0 <= r["cosine"] <= 1.0 + 1e-9


def test_pmi_collocation_detects_planted_pair(spark):
    """'alpha' and 'beta' co-occur in every doc they appear in; 'alpha'
    and 'noise' co-occur at chance. PMI must rank the planted pair
    first and give the chance pair ≈ 0."""
    from nahuatl_data_pipeline_spark.operators.tfidf import pmi_cooccurrence

    rows = [(i, "alpha beta filler") for i in range(25)] + [
        (100 + i, "noise filler") for i in range(25)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = pmi_cooccurrence(docs, "doc_id", "text", min_pair_docs=5).collect()
    by_pair = {(r["term_a"], r["term_b"]): r["pmi"] for r in got}
    import math

    # alpha∩beta = 25 docs, each marginal 25, N=50 → pmi = ln 2
    assert by_pair[("alpha", "beta")] == round(math.log(2), 6)
    # filler appears everywhere → pmi(alpha, filler) = ln(25·50/(25·50)) = 0
    assert by_pair[("alpha", "filler")] == 0.0


def test_pmi_max_vocab_caps_pairs_but_not_scores(spark):
    """max_vocab restricts WHICH pairs are emitted (top-df vocabulary
    before the self-join — the round-9 fan-out lever), never the PMI
    values of survivors: marginals/N stay pre-cut."""
    from nahuatl_data_pipeline_spark.operators.tfidf import pmi_cooccurrence

    # 'big1'/'big2' in 20 docs each (always together); per-doc unique
    # 'salt<i>' tokens inflate the open vocabulary (the 100 TB failure
    # shape: unbounded C(d,2) fan-out from rare terms)
    rows = [(i, f"big1 big2 salt{i}a salt{i}b") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    full = pmi_cooccurrence(docs, "doc_id", "text", min_pair_docs=5)
    capped = pmi_cooccurrence(
        docs, "doc_id", "text", min_pair_docs=5, max_vocab=2
    )
    f = {(r["term_a"], r["term_b"]): r["pmi"] for r in full.collect()}
    c = {(r["term_a"], r["term_b"]): r["pmi"] for r in capped.collect()}
    # vocabulary rank: big1/big2 (df=20) beat every salt token (df=1)
    assert set(c) == {("big1", "big2")}
    assert c[("big1", "big2")] == f[("big1", "big2")]
    # the capped pair-join input is bounded: salt pairs never emitted
    # even below the support floor path
    capped_lowfloor = pmi_cooccurrence(
        docs, "doc_id", "text", min_pair_docs=1, max_vocab=2
    ).collect()
    assert {(r["term_a"], r["term_b"]) for r in capped_lowfloor} == {
        ("big1", "big2")
    }


def test_pmi_support_floor(spark):
    from nahuatl_data_pipeline_spark.operators.tfidf import pmi_cooccurrence

    rows = [(1, "rare1 rare2")] + [(i, "common stuff") for i in range(2, 40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = pmi_cooccurrence(docs, "doc_id", "text", min_pair_docs=5).collect()
    assert ("rare1", "rare2") not in {(r["term_a"], r["term_b"]) for r in got}


def test_vocab_coverage_hand_case(spark):
    from nahuatl_data_pipeline_spark.operators.tfidf import vocab_coverage

    # train vocab (unigram shingles, V=2): "a" (3 docs), "b" (2) kept;
    # "c" (1) cut by the tiebreak rank
    train = spark.createDataFrame(
        [(1, "a b"), (2, "a b c"), (3, "a")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(1, "g1", "a b"), (2, "g1", "x"), (3, "g2", "a x y")],
        ["doc_id", "grp", "text"],
    )
    got = {
        r["grp"]: (r["n_terms"], r["oov_terms"], r["oov_rate"])
        for r in vocab_coverage(
            docs, train, "grp", "text", shingle_n=1, vocab_size=2
        ).collect()
    }
    # g1: terms a,b,x -> 1 OOV of 3; g2: a,x,y -> 2 OOV of 3
    assert got["g1"] == (3, 1, round(1 / 3, 6))
    assert got["g2"] == (3, 2, round(2 / 3, 6))


def test_vocab_coverage_tiebreak_deterministic(spark):
    from nahuatl_data_pipeline_spark.operators.tfidf import vocab_coverage

    # all terms tie at count 1: vocabulary = lexicographically first V
    train = spark.createDataFrame([(1, "d c b a")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "g", "a b c d")], ["doc_id", "grp", "text"]
    )
    row = vocab_coverage(
        docs, train, "grp", "text", shingle_n=1, vocab_size=2
    ).collect()[0]
    # vocab = {a, b}; c and d are OOV
    assert (row["n_terms"], row["oov_terms"]) == (4, 2)


# ---------------------------------------------------------------------------
# candidates='banded' mode (round 8)
# ---------------------------------------------------------------------------


def _banded_corpus(spark):
    """20 base docs with distinct 8-token texts + 5 near-dup variants
    (2-token tail) — the variants share nearly all 3-gram shingles with
    their originals, so banding must surface them."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(8))) for i in range(20)
    ]
    rows += [
        (100 + i, " ".join(f"w{i}x{j}" for j in range(8)) + " tail tok")
        for i in range(5)
    ]
    return _docs(spark, rows)


def test_banded_mode_subset_of_exact_with_identical_scores(spark):
    """Banded pruning may only DROP pairs, never change a score: every
    banded pair must appear in the exact output with the same cosine."""
    from nahuatl_data_pipeline_spark.operators.tfidf import (
        tfidf_cosine_pairs,
    )

    docs = _banded_corpus(spark)
    kw = dict(shingle_n=3, df_cap=100, threshold=0.1)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", candidates="all", **kw
        ).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", candidates="banded", **kw
        ).collect()
    }
    assert banded, "banding found no pairs at all"
    for pair, cos in banded.items():
        assert pair in exact and exact[pair] == cos


def test_banded_mode_finds_planted_near_dups(spark):
    """Each planted variant shares all 6 of its original's 3-gram
    shingles (8-token doc → 6 shingles; the variant adds 4 more) —
    Jaccard 0.6, cosine ≈ high — and must survive banding."""
    from nahuatl_data_pipeline_spark.operators.tfidf import (
        tfidf_cosine_pairs,
    )

    got = tfidf_cosine_pairs(
        _banded_corpus(spark),
        "doc_id",
        "text",
        shingle_n=3,
        df_cap=100,
        threshold=0.5,
        candidates="banded",
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    for i in range(5):
        assert (i, 100 + i) in pairs


def test_banded_mode_shuffle_fallback_matches_broadcast(spark):
    """broadcast_max_candidates=0 forces the shuffle-join path; results
    must be identical to the broadcast path."""
    from nahuatl_data_pipeline_spark.operators.tfidf import (
        tfidf_cosine_pairs,
    )

    docs = _banded_corpus(spark)
    kw = dict(
        shingle_n=3, df_cap=100, threshold=0.1, candidates="banded"
    )
    a = sorted(
        map(
            tuple,
            tfidf_cosine_pairs(docs, "doc_id", "text", **kw).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            tfidf_cosine_pairs(
                docs, "doc_id", "text", broadcast_max_candidates=0, **kw
            ).collect(),
        )
    )
    assert a == b


def test_banded_mode_rejects_unknown_mode(spark):
    import pytest

    from nahuatl_data_pipeline_spark.operators.tfidf import (
        tfidf_cosine_pairs,
    )

    with pytest.raises(ValueError, match="candidates"):
        tfidf_cosine_pairs(
            _docs(spark, [(1, "a b c")]),
            "doc_id",
            "text",
            df_cap=5,
            candidates="bogus",
        )
