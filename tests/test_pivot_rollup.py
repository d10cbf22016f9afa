"""pivot_agg / rollup_agg unit tests (operators/pivot.py): fixed output
schema, subtotal semantics, grouping_id bitmask, and the one-shuffle
Expand plan for rollup."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.pivot import pivot_agg, rollup_agg


def _sales(spark):
    pdf = pd.DataFrame(
        [
            ("r1", "n1", "A", 10.0),
            ("r1", "n1", "B", 20.0),
            ("r1", "n2", "A", 5.0),
            ("r2", "n3", "B", 7.0),
        ],
        columns=["region", "nation", "status", "amount"],
    )
    return spark.createDataFrame(
        pdf, schema="region string, nation string, status string, amount double"
    )


def test_pivot_schema_fixed_by_call_not_data(spark):
    out = pivot_agg(
        _sales(spark),
        ["region"],
        "status",
        ["A", "B", "C"],  # C absent from the data → still a column
        F.sum("amount"),
        prefix="amt_",
    )
    assert out.columns == ["region", "amt_A", "amt_B", "amt_C"]
    rows = {r["region"]: r for r in out.collect()}
    assert rows["r1"]["amt_A"] == 15.0
    assert rows["r1"]["amt_B"] == 20.0
    assert rows["r1"]["amt_C"] is None
    assert rows["r2"]["amt_B"] == 7.0


def test_pivot_no_discovery_job_and_partial_agged_plan(spark):
    """Explicit values keep pivot LAZY (no eager distinct job over the
    pivot column — proven by pivoting a column whose evaluation would
    raise) and the plan is two map-side-combined aggregates: the
    (keys, pivot) pre-aggregate and the pivotfirst fold."""

    @F.udf("string")
    def boom(x):
        raise RuntimeError("pivot-column evaluation must not run eagerly")

    poisoned = _sales(spark).withColumn("status", boom("status"))
    # must not raise: with values supplied, nothing executes at build time
    pivot_agg(poisoned, ["region"], "status", ["A", "B"], F.sum("amount"))

    out = pivot_agg(
        _sales(spark), ["region"], "status", ["A", "B"], F.sum("amount")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "pivotfirst" in plan
    assert plan.count("Exchange") == 2
    assert plan.count("partial_") == 2  # both shuffles behind partial aggs


def test_rollup_levels_and_bitmask(spark):
    out = rollup_agg(
        _sales(spark),
        ["region", "nation"],
        [F.sum("amount").alias("amount"), F.count(F.lit(1)).alias("n")],
    )
    got = {
        (r["region"], r["nation"]): (r["grouping_level"], r["amount"], r["n"])
        for r in out.collect()
    }
    assert got[("r1", "n1")] == (0, 30.0, 2)  # detail
    assert got[("r1", "ALL")] == (1, 35.0, 3)  # per-region subtotal
    assert got[("ALL", "ALL")] == (3, 42.0, 4)  # grand total
    assert ("ALL", "n1") not in got  # rollup, not cube: no such set


def test_rollup_is_one_expand_one_shuffle(spark):
    out = rollup_agg(_sales(spark), ["region", "nation"], [F.sum("amount").alias("s")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("Exchange") == 1  # all grouping sets share one shuffle


def test_cube_has_all_grouping_sets(spark):
    from nahuatl_data_pipeline_spark.operators.pivot import cube_agg

    out = cube_agg(
        _sales(spark), ["region", "nation"], [F.sum("amount").alias("amount")]
    )
    got = {
        (r["region"], r["nation"]): (r["grouping_level"], r["amount"])
        for r in out.collect()
    }
    assert got[("r1", "n1")] == (0, 30.0)
    assert got[("r1", "ALL")] == (1, 35.0)
    assert got[("ALL", "n1")] == (2, 30.0)  # the set rollup lacks
    assert got[("ALL", "ALL")] == (3, 42.0)
    # plan read on a fresh frame: AQE rewrites executedPlan after an action
    fresh = cube_agg(
        _sales(spark), ["region", "nation"], [F.sum("amount").alias("amount")]
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and plan.count("Exchange") == 1


def test_grouping_sets_only_requested_sets(spark):
    from nahuatl_data_pipeline_spark.operators.pivot import grouping_sets_agg

    out = grouping_sets_agg(
        _sales(spark),
        ["region", "nation"],
        [["region"], ["nation"], []],  # marginals + total, NO 2-D detail
        [F.sum("amount").alias("amount")],
    )
    got = {
        (r["region"], r["nation"]): (r["grouping_level"], r["amount"])
        for r in out.collect()
    }
    assert got[("r1", "ALL")] == (1, 35.0)
    assert got[("ALL", "n1")] == (2, 30.0)
    assert got[("ALL", "ALL")] == (3, 42.0)
    # 2 regions + 3 nations + 1 total — and NO detail rows (a cube would
    # add 4): grouping_level 0 never appears
    assert len(got) == 6
    assert all(lvl != 0 for lvl, _ in got.values())
    fresh = grouping_sets_agg(
        _sales(spark), ["region", "nation"],
        [["region"], ["nation"], []], [F.sum("amount").alias("amount")],
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and plan.count("Exchange") == 1


def test_rollup_null_data_key_disambiguated_by_grouping_level(spark):
    """A NULL data value coalesces to the same 'ALL' label as a subtotal
    row — grouping_level is the disambiguator (0 = real detail row with
    null key, >0 = rolled-up). Pin that contract."""
    pdf = pd.DataFrame(
        [(None, "n1", 10.0), ("r1", "n1", 5.0)],
        columns=["region", "nation", "amount"],
    )
    df = spark.createDataFrame(
        pdf, schema="region string, nation string, amount double"
    )
    out = rollup_agg(df, ["region", "nation"], [F.sum("amount").alias("a")])
    rows = {
        (r["region"], r["nation"], r["grouping_level"]): r["a"]
        for r in out.collect()
    }
    assert rows[("ALL", "n1", 0)] == 10.0  # null data key, detail level
    assert rows[("ALL", "ALL", 3)] == 15.0  # true grand total
    assert rows[("ALL", "ALL", 1)] == 10.0  # null-region subtotal


# ---------------------------------------------------------------------------
# topn_other
# ---------------------------------------------------------------------------


def test_topn_other_head_tail_and_ties(spark):
    from nahuatl_data_pipeline_spark.operators.pivot import topn_other

    rows = (
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    )
    df = spark.createDataFrame(rows, ["k"])
    out = {r["label"]: (r["total"], r["n_keys"])
           for r in topn_other(df, "k", n=2).collect()}
    # b and c tie on 3; key-asc tiebreak keeps b in the head
    assert out == {"a": (5, 1), "b": (3, 1), "OTHER": (4, 2)}


def test_topn_other_weighted_and_no_tail(spark):
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.operators.pivot import topn_other

    df = spark.createDataFrame(
        [("x", 10), ("x", 5), ("y", 2)], ["k", "w"]
    )
    out = {r["label"]: r["total"]
           for r in topn_other(df, "k", n=5, weight=F.col("w")).collect()}
    # every key fits the head: no OTHER row is emitted
    assert out == {"x": 15, "y": 2}
