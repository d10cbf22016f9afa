"""blocked_levenshtein_pairs / profile_table unit tests
(operators/linkage.py, operators/profile.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.linkage import (
    blocked_levenshtein_pairs,
    prefix_block,
)
from nahuatl_data_pipeline_spark.operators.profile import profile_table


def _names(spark, rows):
    pdf = pd.DataFrame(rows, columns=["id", "name"])
    return spark.createDataFrame(pdf, schema="id long, name string")


def test_linkage_finds_typos_within_block_only(spark):
    df = _names(
        spark,
        [
            (1, "golden widget"),
            (2, "golden widgit"),   # 1 edit, same prefix block
            (3, "golden doohickey"),  # same block, >2 edits → rejected
            (4, "olden widget"),    # 1 edit but DIFFERENT block → unseen
            (5, "silver bolt"),
        ],
    )
    out = blocked_levenshtein_pairs(
        df, "id", "name", prefix_block("name", 6), max_distance=2
    )
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in out.collect()}
    assert got == {(1, 2): 1}  # blocking recall bound: (1,4) never compared


def test_linkage_block_cap_sheds_hot_block(spark):
    hot = [(i, "same name") for i in range(20)]
    cool = [(100, "rare title"), (101, "rare titel")]
    out = blocked_levenshtein_pairs(
        _names(spark, hot + cool), "id", "name",
        prefix_block("name", 5), max_distance=2, max_block_size=10,
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(100, 101)}


def test_profile_counts_nulls_and_types(spark):
    pdf = pd.DataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, None), (3, 6.0, "b")],
        columns=["k", "v", "s"],
    )
    df = spark.createDataFrame(pdf, schema="k long, v double, s string")
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 3
    assert rows["v"]["n_nulls"] == 1 and rows["v"]["mean_val"] == 4.0
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["mean_val"] is None
    assert rows["s"]["min_val"] == "a" and rows["s"]["max_val"] == "b"
    # output order follows the requested column order
    assert [r["column"] for r in profile_table(df).collect()] == ["k", "v", "s"]


def test_profile_scan_and_aggregate_shape(spark, tmp_path):
    path = str(tmp_path / "p.parquet")
    spark.range(100).selectExpr("id", "id * 2.0 AS v").write.parquet(path)
    df = spark.read.parquet(path)
    # exact mode (r13): the exact-distinct aggregate and the
    # min/max/mean fold are SEPARATE scans joined as 1-row frames —
    # the combined form planned Expand + SortAggregate (string min/max
    # buffers are hash-ineligible) and sorted (cols+1)x the table
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 2
    assert "SortAggregate" not in plan

    # approx mode keeps the one-scan shape (fixed-size HLL buffers
    # fold into the same aggregate)
    aplan = (
        profile_table(df, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert aplan.count("FileScan parquet") == 1

    approx = profile_table(df, approx=True).collect()
    nd = {r["column"]: r["n_distinct"] for r in approx}
    assert abs(nd["id"] - 100) <= 10  # approx_count_distinct ballpark


def test_profile_handles_dotted_column_names(spark):
    pdf = pd.DataFrame([(1, 2.0), (3, 4.0)], columns=["a.b", "x"])
    df = spark.createDataFrame(pdf)
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["a.b"]["n_rows"] == 2 and rows["a.b"]["mean_val"] == 2.0
    assert rows["x"]["n_distinct"] == 2
