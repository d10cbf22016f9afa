"""DSIR importance weighting (operators/importance.py) and margin-based
neighbor mining (similarity.margin_topk) — unit semantics on hand-built
corpora; full engine parity runs via the q138/q139 oracles."""

import math

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.importance import (
    dsir_log_weights,
    ngram_bag,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_bag_keeps_repeats(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "x"), (3, None)])
    out = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", ngram_bag("text", n=2).alias("g")
        ).collect()
    }
    assert out[1] == ["a b", "b a", "a b"]  # bag, not set
    assert out[2] == [] and out[3] == []


def test_dsir_target_like_docs_score_higher(spark):
    """Docs made of target-domain bigrams must outweigh docs made of
    bigrams the target never uses."""
    target = _docs(
        spark,
        [(100 + i, "maize harvest ritual calendar") for i in range(5)],
    )
    docs = _docs(
        spark,
        [
            (1, "maize harvest ritual calendar"),       # pure target
            (2, "stock market futures trading desk"),   # pure off-target
            (3, "maize harvest trading desk"),          # mixed
        ],
    )
    out = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(docs, target, n_buckets=64).collect()
    }
    assert out[1] > out[3] > out[2]
    assert out[1] > 0 > out[2]


def test_dsir_weight_hand_value(spark):
    """One doc, one bigram, tiny bucket space: log_weight must equal the
    closed-form add-1 estimate."""
    target = _docs(spark, [(10, "a b"), (11, "a b")])
    docs = _docs(spark, [(1, "a b")])
    row = dsir_log_weights(
        docs, target, ngram_n=2, n_buckets=16, round_to=6
    ).collect()[0]
    # raw corpus = docs side: 1 occurrence total; target: 2 occurrences.
    expected = (
        math.log(2 + 1) - math.log(2 + 16) - math.log(1 + 1) + math.log(1 + 16)
    )
    assert row["n_grams"] == 1
    assert row["log_weight"] == pytest.approx(round(expected, 6), abs=1e-6)


def test_dsir_short_and_null_docs_absent(spark):
    target = _docs(spark, [(10, "a b c")])
    docs = _docs(spark, [(1, "a b c"), (2, "single"), (3, None)])
    ids = {
        r["doc_id"] for r in dsir_log_weights(docs, target).collect()
    }
    assert ids == {1}


def test_margin_topk_suppresses_hub(spark):
    """A hub vector close to BOTH queries gets its margin deflated by
    its own high neighborhood average, while a vector exclusive to one
    query ranks above it on margin despite a lower raw cosine."""
    from nahuatl_data_pipeline_spark.operators.similarity import margin_topk

    rows = [
        (0, [1.0, 0.0, 0.0]),     # query A
        (1, [0.0, 1.0, 0.0]),     # query B
        (10, [0.9, 0.9, 0.1]),    # hub: near A and B
        (11, [0.95, 0.0, 0.3]),   # exclusive to A
        (12, [0.0, 0.9, 0.4]),    # exclusive to B
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = margin_topk(
        df.filter(F.col("vec_id") < 2), df, k_margin=2, k=3
    ).collect()
    ranked = {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in out
    }
    by_pair = {(r["query_id"], r["neighbor_id"]): r for r in out}
    # raw cosine puts the hub first for query 0 (cos≈0.705 vs 0.953 for
    # 11 — actually 11 wins on cosine too here), so assert the designed
    # property directly: margin(0,11) > margin(0,10) with both present
    assert by_pair[(0, 11)]["margin"] > by_pair[(0, 10)]["margin"]
    assert by_pair[(1, 12)]["margin"] > by_pair[(1, 10)]["margin"]
    # ranks are 1..k and margin-descending per query
    for qid in (0, 1):
        ms = [by_pair[(qid, ranked[(qid, r)])]["margin"] for r in (1, 2, 3)]
        assert ms == sorted(ms, reverse=True)


def test_dsir_flag_form_equals_frame_form(spark):
    """The flag form (target = boolean Column over df) must produce
    exactly the frame form's weights when the target frame is the
    flagged subset — the r13 rollup identity (a doc's occurrences all
    carry its flag, so summed per-doc counts equal flagged occurrence
    counts). Also: passing both/neither target arguments raises."""
    import pytest

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta gamma", "t"),
            (2, "alpha beta delta epsilon", "t"),
            (3, "zeta eta theta iota kappa", "o"),
            (4, "beta gamma beta gamma alpha", "o"),
            (5, "nu xi omicron pi rho sigma", "o"),
        ],
        "doc_id long, text string, source string",
    )
    from pyspark.sql import functions as F

    frame_form = {
        (r["doc_id"], r["n_grams"], r["log_weight"])
        for r in dsir_log_weights(
            docs.select("doc_id", "text"),
            docs.filter(F.col("source") == "t").select("doc_id", "text"),
            n_buckets=64,
        ).collect()
    }
    flag_form = {
        (r["doc_id"], r["n_grams"], r["log_weight"])
        for r in dsir_log_weights(
            docs,
            target_flag=F.col("source") == "t",
            n_buckets=64,
        ).collect()
    }
    assert flag_form == frame_form

    with pytest.raises(ValueError, match="exactly one"):
        dsir_log_weights(docs)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_log_weights(
            docs,
            docs.select("doc_id", "text"),
            target_flag=F.col("source") == "t",
        )
