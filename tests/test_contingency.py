"""chi2_independence unit tests (operators/contingency.py): hand-computed
statistic, independence → 0, null categories as levels, and the
materialized-cells plan contract."""

from __future__ import annotations

import pandas as pd
import pytest

from nahuatl_data_pipeline_spark.operators.contingency import chi2_independence


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["a", "b"])
    return spark.createDataFrame(pdf, schema="a string, b string")


def test_chi2_hand_computed(spark):
    # 2x2 table: [[20, 10], [10, 20]]  n=60
    # expected each cell = 15; chi2 = 4 * (5^2/15) = 6.666667
    rows = (
        [("x", "u")] * 20 + [("x", "v")] * 10
        + [("y", "u")] * 10 + [("y", "v")] * 20
    )
    out = chi2_independence(_df(spark, rows), "a", "b").collect()[0]
    assert out["chi2"] == pytest.approx(6.666667, abs=1e-6)
    assert out["dof"] == 1
    assert out["n_obs"] == 60


def test_chi2_independent_is_zero(spark):
    # perfectly proportional rows → chi2 == 0
    rows = (
        [("x", "u")] * 8 + [("x", "v")] * 4
        + [("y", "u")] * 4 + [("y", "v")] * 2
    )
    out = chi2_independence(_df(spark, rows), "a", "b").collect()[0]
    assert out["chi2"] == 0.0


def test_chi2_null_category_is_a_level(spark):
    # a=None must participate as its own level (eqNullSafe joins), not
    # silently drop — dof reflects 2 levels of a
    rows = [("x", "u")] * 5 + [(None, "u")] * 3 + [(None, "v")] * 2 + [
        ("x", "v")
    ] * 4
    out = chi2_independence(_df(spark, rows), "a", "b").collect()[0]
    assert out["n_obs"] == 14  # nothing dropped
    assert out["dof"] == 1  # (2-1)*(2-1)


def test_chi2_zero_cells_contribute(spark):
    # [[5,0],[0,5]]: the two EMPTY cells must contribute (0-E)^2/E = 2.5
    # each — full-grid Pearson chi2 = 10.0, not the observed-cells-only
    # 5.0 (scipy.stats.chi2_contingency(correction=False) agrees)
    rows = [("x", "u")] * 5 + [("y", "v")] * 5
    out = chi2_independence(_df(spark, rows), "a", "b").collect()[0]
    assert out["chi2"] == pytest.approx(10.0, abs=1e-6)
    assert out["dof"] == 1
    assert out["n_obs"] == 10


def test_chi2_single_scan_of_input(spark, tmp_path):
    """The cells table is localCheckpoint'ed: the output plan must not
    re-scan the input once per marginal."""
    path = str(tmp_path / "cc.parquet")
    _df(spark, [("x", "u")] * 5 + [("y", "v")] * 5).write.parquet(path)
    df = spark.read.parquet(path)
    out = chi2_independence(df, "a", "b")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0  # all legs read the checkpoint


# ---------------------------------------------------------------------------
# mutual_information
# ---------------------------------------------------------------------------


def test_mi_independent_columns_zero(spark):
    """Perfectly balanced joint (independent) → MI exactly 0 per level:
    ln(p(a,b)/(p(a)p(b))) = ln(1) for every cell."""
    from nahuatl_data_pipeline_spark.operators.contingency import (
        mutual_information,
    )

    rows = [(a, b) for a in ["x", "y"] for b in ["s", "t"] for _ in range(25)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {r["a"]: r["mi"] for r in mutual_information(df, "a", "b").collect()}
    assert got == {"x": 0.0, "y": 0.0}


def test_mi_deterministic_association_ln2(spark):
    """a fully determines b over a uniform 2×2 diagonal: each level's
    contribution is p(a)·ln(1/p(b)) = 0.5·ln 2."""
    import math

    from nahuatl_data_pipeline_spark.operators.contingency import (
        mutual_information,
    )

    rows = [("x", "s")] * 50 + [("y", "t")] * 50
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {r["a"]: r["mi"] for r in mutual_information(df, "a", "b").collect()}
    expect = round(0.5 * math.log(2), 6)
    assert got == {"x": expect, "y": expect}


def test_mi_topk_ranks_discriminative_levels_first(spark):
    from nahuatl_data_pipeline_spark.operators.contingency import (
        mutual_information,
    )

    rows = (
        [("loaded", "s1")] * 60
        + [("loaded", "s2")] * 5
        + [("flat", "s1")] * 30
        + [("flat", "s2")] * 30
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    top = mutual_information(df, "a", "b", top_k=1).collect()
    assert top[0]["a"] == "loaded"


# ---------------------------------------------------------------------------
# cohens_kappa
# ---------------------------------------------------------------------------


def test_kappa_perfect_agreement_is_one(spark):
    from nahuatl_data_pipeline_spark.operators.contingency import (
        cohens_kappa,
    )

    df = spark.createDataFrame(
        [("x", "x")] * 7 + [("y", "y")] * 3, ["a", "b"]
    )
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row["n"] == 10 and row["po"] == 1.0 and row["kappa"] == 1.0


def test_kappa_hand_computed_textbook_grid(spark):
    from nahuatl_data_pipeline_spark.operators.contingency import (
        cohens_kappa,
    )

    # classic 2x2: cells yes/yes=20, yes/no=5, no/yes=10, no/no=15
    rows = (
        [("yes", "yes")] * 20 + [("yes", "no")] * 5
        + [("no", "yes")] * 10 + [("no", "no")] * 15
    )
    row = cohens_kappa(spark.createDataFrame(rows, ["a", "b"]), "a", "b").collect()[0]
    # po = 35/50 = .7; pe = (25*30 + 25*20)/2500 = .5; kappa = .4
    assert row["po"] == 0.7 and row["pe"] == 0.5 and row["kappa"] == 0.4


def test_kappa_disjoint_label_spaces_and_null_drop(spark):
    from nahuatl_data_pipeline_spark.operators.contingency import (
        cohens_kappa,
    )

    # rater b uses a label rater a never does; NULL-labeled row drops
    rows = [("x", "x"), ("x", "z"), ("x", None)]
    row = cohens_kappa(
        spark.createDataFrame(rows, "a: string, b: string"), "a", "b"
    ).collect()[0]
    # n=2; po=.5; pe: rm={x:2}, cm={x:1,z:1} -> (2*1 + 0*1)/4 = .5; kappa=0
    assert row["n"] == 2 and row["po"] == 0.5 and row["pe"] == 0.5
    assert row["kappa"] == 0.0
