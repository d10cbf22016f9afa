"""J5 alignment join + A14 corpus metrics tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.embeddings import hashed_embedding
from nahuatl_data_pipeline_spark.operators.alignment import align_sentences
from nahuatl_data_pipeline_spark.operators.evaluation import (
    corpus_bleu,
    corpus_chrf,
    evaluation_report,
)


# --- alignment -------------------------------------------------------------


def test_hashed_embedding_properties():
    a = hashed_embedding("hola mundo grande")
    b = hashed_embedding("hola mundo grande")
    c = hashed_embedding("totally different words here")
    assert a == b  # deterministic
    assert abs(sum(x * x for x in a) - 1.0) < 1e-3  # unit norm
    cos_ac = sum(x * y for x, y in zip(a, c))
    assert cos_ac < 0.5  # disjoint token sets ≈ orthogonal
    assert hashed_embedding(None) is None


def test_align_sentences_matches_shared_content(spark):
    left = spark.createDataFrame(
        [("uno dos tres cuatro cinco",), ("xx yy zz ww qq",)], ["nah"]
    )
    right = spark.createDataFrame(
        [
            ("uno dos tres cuatro cinco",),  # identical → cosine 1
            ("aa bb cc dd ee",),
        ],
        ["es"],
    )
    out = align_sentences(left, right, "nah", "es", min_score=0.99).collect()
    assert len(out) == 1
    assert out[0]["nah"] == out[0]["es"] == "uno dos tres cuatro cinco"
    assert out[0]["score"] >= 0.99


def test_align_threshold_filters_weak_pairs(spark):
    left = spark.createDataFrame([("palabras sin par",)], ["nah"])
    right = spark.createDataFrame([("nothing in common at all",)], ["es"])
    assert (
        align_sentences(left, right, "nah", "es", min_score=0.85).count() == 0
    )


# --- corpus metrics --------------------------------------------------------


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "hyp string, ref string")


def test_chrf_perfect_and_zero(spark):
    perfect = _pairs(spark, [("hola mundo", "hola mundo")] * 3)
    assert corpus_chrf(perfect, "hyp", "ref") == pytest.approx(100.0)
    disjoint = _pairs(spark, [("aaaa", "zzzz")])
    assert corpus_chrf(disjoint, "hyp", "ref") == pytest.approx(0.0)


def test_chrf_hand_computed(spark):
    # hyp "ab", ref "abc" (single chars: a,b vs a,b,c; bigrams: ab vs ab,bc)
    df = _pairs(spark, [("ab", "abc")])
    # n=1: match 2, hyp 2, ref 3 → P=1, R=2/3, F2 = 5·P·R/(4P+R) = 10/14...
    p1, r1 = 1.0, 2 / 3
    f1 = 5 * p1 * r1 / (4 * p1 + r1)
    p2, r2 = 1.0, 1 / 2
    f2 = 5 * p2 * r2 / (4 * p2 + r2)
    expected = 100.0 * (f1 + f2) / 2  # n≥3: hyp & ref empty for hyp → skipped?
    # n=3: hyp has 0 trigrams, ref has 1 → included with P=0 → F=0
    p3r3f3 = 0.0
    expected = 100.0 * (f1 + f2 + p3r3f3) / 3
    assert corpus_chrf(df, "hyp", "ref") == pytest.approx(expected, abs=1e-6)


def test_bleu_perfect_and_partial(spark):
    perfect = _pairs(spark, [("the cat sat on the mat", "the cat sat on the mat")])
    assert corpus_bleu(perfect, "hyp", "ref") == pytest.approx(100.0)
    partial = _pairs(spark, [("the cat sat", "the cat sat on the mat")])
    # all 1-3-gram precisions are 1 but there are no 4-grams in hyp → 0
    assert corpus_bleu(partial, "hyp", "ref") == 0.0


def test_bleu_brevity_penalty(spark):
    df = _pairs(
        spark,
        [("the cat sat on the", "the cat sat on the mat")],
    )
    # precisions all 1.0 (every hyp n-gram appears in ref); BP = e^(1-6/5)
    assert corpus_bleu(df, "hyp", "ref") == pytest.approx(
        100.0 * math.exp(1 - 6 / 5), rel=1e-6
    )


def test_evaluation_report_shape(spark):
    df = _pairs(spark, [("hola mundo", "hola mundo")])
    rows = {r["metric"]: r["value"] for r in evaluation_report(df, "hyp", "ref").collect()}
    assert set(rows) == {"chrf", "bleu"}
    assert rows["chrf"] == pytest.approx(100.0)
