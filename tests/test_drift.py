"""Drift-score invariants (operators/drift.py): zero on identical
corpora, positive and symmetric on diverged ones, vocab accounting."""

from __future__ import annotations

import pandas as pd

from nahuatl_data_pipeline_spark.operators.drift import token_drift


def _docs(spark, texts):
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    return spark.createDataFrame(pdf, schema="doc_id long, text string")


def test_identical_corpora_zero_drift(spark):
    a = _docs(spark, ["the cat sat", "on the mat"])
    r = token_drift(a, a).first()
    assert r["kl_ab"] == 0.0 and r["kl_ba"] == 0.0 and r["drift_score"] == 0.0
    assert r["vocab_a"] == r["vocab_b"] == r["vocab_union"] == 5


def test_disjoint_vocab_drifts_more_than_overlap(spark):
    base = _docs(spark, ["alpha beta gamma delta"])
    near = _docs(spark, ["alpha beta gamma epsilon"])
    far = _docs(spark, ["one two three four"])
    d_near = token_drift(base, near).first()["drift_score"]
    d_far = token_drift(base, far).first()["drift_score"]
    assert 0 < d_near < d_far
    assert token_drift(base, far).first()["vocab_union"] == 8


def test_drift_is_symmetric(spark):
    a = _docs(spark, ["x y z z"])
    b = _docs(spark, ["x q q r"])
    ab = token_drift(a, b).first()
    ba = token_drift(b, a).first()
    assert ab["drift_score"] == ba["drift_score"]
    assert ab["kl_ab"] == ba["kl_ba"]


# ---------------------------------------------------------------------------
# ks_two_sample
# ---------------------------------------------------------------------------


def test_ks_identical_samples_zero(spark):
    from nahuatl_data_pipeline_spark.operators.drift import ks_two_sample

    rows = [("a", float(v)) for v in range(50)] + [
        ("b", float(v)) for v in range(50)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert r["ks_stat"] == 0.0
    assert r["n_a"] == r["n_b"] == 50


def test_ks_disjoint_samples_one(spark):
    from nahuatl_data_pipeline_spark.operators.drift import ks_two_sample

    rows = [("a", float(v)) for v in range(50)] + [
        ("b", 1000.0 + v) for v in range(50)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert r["ks_stat"] == 1.0


def test_ks_half_shifted(spark):
    """b = a shifted by half the support: D = 0.5 exactly for uniform
    grids (CDFs diverge over the non-overlapping half)."""
    from nahuatl_data_pipeline_spark.operators.drift import ks_two_sample

    rows = [("a", float(v)) for v in range(100)] + [
        ("b", float(v) + 50.0) for v in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert r["ks_stat"] == 0.5


def test_ks_null_values_dropped(spark):
    """NULLs are not CDF evaluation points: a NULL-bearing sample must
    score identically to the same sample without the NULL."""
    from nahuatl_data_pipeline_spark.operators.drift import ks_two_sample

    base = [("a", float(v)) for v in range(20)] + [
        ("b", float(v) + 10) for v in range(20)
    ]
    df1 = spark.createDataFrame(base, "g string, v double")
    df2 = spark.createDataFrame(
        base + [("a", None), ("b", None)], "g string, v double"
    )
    r1 = ks_two_sample(df1, "v", "g", "a", "b").collect()[0]
    r2 = ks_two_sample(df2, "v", "g", "a", "b").collect()[0]
    assert (r1["ks_stat"], r1["n_a"], r1["n_b"]) == (
        r2["ks_stat"],
        r2["n_a"],
        r2["n_b"],
    )
