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


# ---------------------------------------------------------------------------
# interpolate_fill
# ---------------------------------------------------------------------------


def test_interpolate_fill_lerp_and_edges(spark):
    from nahuatl_data_pipeline_spark.operators.repair import interpolate_fill

    rows = [("a", 10, 1.0), ("a", 13, 7.0), ("a", 15, 7.0)]
    df = spark.createDataFrame(rows, ["k", "slot", "v"])
    out = {
        r["slot"]: (r["v_filled"], r["was_gap"])
        for r in interpolate_fill(df, ["k"], "slot", "v").collect()
    }
    assert out[10] == (1.0, False)
    assert out[11] == (3.0, True)  # 1 + (7-1) * 1/3
    assert out[12] == (5.0, True)
    assert out[13] == (7.0, False)
    assert out[14] == (7.0, True)
    assert out[15] == (7.0, False)
    assert len(out) == 6


def test_interpolate_fill_null_interior_value_clamps_and_keys_isolate(spark):
    from nahuatl_data_pipeline_spark.operators.repair import interpolate_fill

    rows = [
        ("a", 1, 2.0),
        ("a", 3, None),  # explicit null row: a gap, neighbors lerp over it
        ("a", 5, 4.0),
        ("b", 100, 9.0),
    ]
    df = spark.createDataFrame(rows, "k: string, slot: bigint, v: double")
    got = {
        (r["k"], r["slot"]): r["v_filled"]
        for r in interpolate_fill(df, ["k"], "slot", "v").collect()
    }
    assert got[("a", 3)] == 3.0  # midpoint of 2 and 4
    assert got[("b", 100)] == 9.0
    assert ("b", 99) not in got  # spines are per-key, not global
