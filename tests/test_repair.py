"""fill_forward / fill_backward unit tests (operators/repair.py)."""

from __future__ import annotations

import pandas as pd

from nahuatl_data_pipeline_spark.operators.repair import (
    fill_backward,
    fill_forward,
)


def _series(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "t", "v"])
    return spark.createDataFrame(pdf, schema="k string, t long, v double")


def test_forward_fill_carries_last_observation(spark):
    df = _series(
        spark,
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, None), ("a", 4, 40.0),
         ("b", 1, None), ("b", 2, 2.0)],
    )
    got = {
        (r["k"], r["t"]): r["v"]
        for r in fill_forward(df, ["k"], "t", ["v"]).collect()
    }
    assert got[("a", 2)] == 10.0 and got[("a", 3)] == 10.0
    assert got[("a", 4)] == 40.0  # real observations untouched
    assert got[("b", 1)] is None  # leading gap stays null
    assert got[("b", 2)] == 2.0


def test_backward_fill_closes_leading_gaps(spark):
    df = _series(spark, [("a", 1, None), ("a", 2, 5.0), ("a", 3, None)])
    fwd_then_back = fill_backward(
        fill_forward(df, ["k"], "t", ["v"]), ["k"], "t", ["v"]
    )
    got = {r["t"]: r["v"] for r in fwd_then_back.collect()}
    assert got == {1: 5.0, 2: 5.0, 3: 5.0}


def test_fill_is_partition_independent(spark):
    rows = [("k", i, None if i % 3 else float(i)) for i in range(60)]
    df = _series(spark, rows)
    a = sorted(map(tuple, fill_forward(df, ["k"], "t", ["v"]).collect()))
    b = sorted(
        map(
            tuple,
            fill_forward(df.repartition(7), ["k"], "t", ["v"]).collect(),
        )
    )
    assert a == b
