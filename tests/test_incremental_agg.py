"""Incremental aggregate-state tests (operators/incremental_agg.py):
merge == whole-corpus aggregate, key pass-through, contract errors —
plus the approx_quantile_buckets scale-path contract (quality.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.incremental_agg import (
    group_state,
    merge_group_states,
)
from nahuatl_data_pipeline_spark.operators.quality import (
    approx_quantile_buckets,
)


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    return spark.createDataFrame(pdf, schema="k string, v double")


def test_merge_equals_whole_aggregate(spark):
    df = _events(
        spark,
        [("a", 1.0), ("a", 5.0), ("b", -2.0), ("b", 7.0), ("c", 0.0)],
    )
    merged = merge_group_states(
        group_state(df.filter(F.col("v") > 0), ["k"], "v"),
        group_state(df.filter(F.col("v") <= 0), ["k"], "v"),
        ["k"],
    )
    whole = group_state(df, ["k"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_merge_disjoint_keys_pass_through(spark):
    a = group_state(_events(spark, [("x", 1.0)]), ["k"], "v")
    b = group_state(_events(spark, [("y", 2.0)]), ["k"], "v")
    got = {r["k"]: (r["sum_v"], r["cnt_v"]) for r in
           merge_group_states(a, b, ["k"]).collect()}
    assert got == {"x": (1.0, 1), "y": (2.0, 1)}


def test_merge_is_associative_over_three_batches(spark):
    df = _events(spark, [(f"k{i % 4}", float(i)) for i in range(60)])
    thirds = [df.filter(F.col("v") % 3 == i) for i in range(3)]
    states = [group_state(t, ["k"], "v") for t in thirds]
    left = merge_group_states(
        merge_group_states(states[0], states[1], ["k"]), states[2], ["k"]
    )
    right = merge_group_states(
        states[0], merge_group_states(states[1], states[2], ["k"]), ["k"]
    )
    assert sorted(map(tuple, left.collect())) == sorted(
        map(tuple, right.collect())
    )


def test_merge_rejects_mismatched_state_columns(spark):
    a = group_state(_events(spark, [("x", 1.0)]), ["k"], "v")
    b = group_state(
        _events(spark, [("x", 1.0)]).withColumnRenamed("v", "w"), ["k"], "w"
    )
    with pytest.raises(ValueError):
        merge_group_states(a, b, ["k"])


def test_quantile_buckets_values_and_plan(spark):
    pdf = pd.DataFrame({"x": list(range(1, 101))})
    df = spark.createDataFrame(pdf, schema="x long")
    out = approx_quantile_buckets(df, "x", n_buckets=4)
    counts = {r["bucket"]: r["n"] for r in out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {1: 25, 2: 25, 3: 25, 4: 25}  # exact at 100 rows
    # scale contract: rows reach their bucket via a broadcast of the
    # 1-row cuts aggregate, never a wide exchange of the row stream
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    with pytest.raises(ValueError):
        approx_quantile_buckets(df, "x", n_buckets=1)


def test_foreachbatch_state_fold_equals_batch(spark, tmp_path):
    """The streaming leg of the state contract: micro-batches folded via
    foreachBatch reproduce the whole-corpus aggregate exactly."""
    pdf = pd.DataFrame(
        {"k": [f"k{i % 3}" for i in range(90)], "v": [float(i) for i in range(90)]}
    )
    df = spark.createDataFrame(pdf, schema="k string, v double")
    path = str(tmp_path / "in")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    df.repartition(4).write.parquet(path)

    state = {"df": None}

    def fold(batch_df, _bid):
        delta = group_state(batch_df, ["k"], "v")
        if state["df"] is None:
            state["df"] = delta.localCheckpoint(eager=True)
        else:
            state["df"] = merge_group_states(
                state["df"], delta, ["k"]
            ).localCheckpoint(eager=True)

    q = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    whole = group_state(df, ["k"], "v")
    assert sorted(map(tuple, state["df"].collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_merge_null_key_groups_fold_together(spark):
    """NULL group keys are real groups: the merge must combine them,
    not emit duplicate null-key state rows (null-safe join contract)."""
    a = _events(spark, [(None, 1.0), ("x", 5.0)])
    b = _events(spark, [(None, 2.0)])
    merged = merge_group_states(
        group_state(a, ["k"], "v"), group_state(b, ["k"], "v"), ["k"]
    )
    rows = {r["k"]: (r["sum_v"], r["cnt_v"], r["min_v"], r["max_v"])
            for r in merged.collect()}
    assert len(rows) == 2
    assert rows[None] == (3.0, 2, 1.0, 2.0)
    assert rows["x"] == (5.0, 1, 5.0, 5.0)


def test_quantile_buckets_null_values_get_null_bucket(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, None]})
    df = spark.createDataFrame(pdf, schema="x double")
    out = approx_quantile_buckets(df, "x", n_buckets=2)
    got = {r["x"]: r["bucket"] for r in out.collect()}
    assert got[None] is None          # no rank -> no bucket
    assert got[1.0] == 1 and got[4.0] == 2
