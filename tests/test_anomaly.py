"""zscore_outliers unit tests (operators/anomaly.py): planted outlier
detection, degenerate groups, and the broadcast-stats plan."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.anomaly import zscore_outliers


def _metrics(spark, rows):
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    return spark.createDataFrame(pdf, schema="g string, v double")


def test_planted_outlier_is_flagged(spark):
    rows = [("a", float(x)) for x in range(20)] + [("a", 1000.0)]
    out = zscore_outliers(_metrics(spark, rows), ["g"], "v", threshold=3.0)
    flagged = [r["v"] for r in out.filter(F.col("is_outlier")).collect()]
    assert flagged == [1000.0]


def test_degenerate_groups_flag_nothing(spark):
    rows = [("single", 5.0), ("const", 2.0), ("const", 2.0), ("const", 2.0)]
    out = zscore_outliers(_metrics(spark, rows), ["g"], "v")
    assert out.filter(F.col("is_outlier")).count() == 0
    # z undefined -> null zscore, never a crash
    assert out.filter(F.col("zscore").isNull()).count() == 4


def test_stats_join_is_broadcast(spark):
    df = _metrics(spark, [("a", float(i)) for i in range(50)])
    plan = (
        zscore_outliers(df, ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_null_group_keys_are_scored_not_dropped(spark):
    rows = [(None, float(x)) for x in range(20)] + [(None, 5000.0), ("g", 1.0)]
    out = zscore_outliers(_metrics(spark, rows), ["g"], "v")
    assert out.count() == 22  # nothing vanishes
    flagged = out.filter(F.col("is_outlier")).collect()
    assert [r["v"] for r in flagged] == [5000.0]
    assert flagged[0]["g"] is None  # scored within the null-key group


def test_broadcast_gate_falls_back_on_many_groups(spark):
    """With auto-broadcast disabled (the test_similarity.py pattern —
    the planner would otherwise broadcast any test-sized side on its
    own), a BroadcastExchange can only come from the operator's forced
    hint; over the group cap the gate must leave none."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        df = _metrics(spark, [(str(i), float(i)) for i in range(100)])
        plan = (
            zscore_outliers(df, ["g"], "v", broadcast_max_groups=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastExchange" not in plan  # gate flipped to shuffle
        gated = zscore_outliers(df, ["g"], "v", broadcast_max_groups=10)
        assert gated.count() == 100  # fallback plan still correct
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_hand_computed(spark):
    """g: values 1..9 plus one wild 1000. median=5.5, absdevs of 1..9 =
    {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5} + 994.5 → sorted gives
    MAD=2.5; cut=3*1.4826*2.5=11.1195 → only the 1000 exceeds it."""
    from nahuatl_data_pipeline_spark.operators.anomaly import mad_outliers

    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = mad_outliers(df, ["k"], "v").collect()
    assert len(out) == 1
    r = out[0]
    assert r["group_median"] == 5.5
    assert r["group_mad"] == 2.5
    assert r["n_outliers"] == 1
    assert r["n_rows"] == 10


def test_mad_immune_to_masking(spark):
    """15 huge values among 100 normal ones inflate the stddev enough
    that z-score (3σ) flags NOTHING (max |z| ≈ √(n/k) ≈ 2.6 at 13%
    contamination — outliers mask themselves), while the median/MAD
    center stays put and flags all 15 — the reason MAD exists."""
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        mad_outliers,
        zscore_outliers,
    )

    rows = [("g", float(v % 7)) for v in range(100)] + [
        ("g", 1e6 + i) for i in range(15)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    z = zscore_outliers(df, ["k"], "v", threshold=3.0)
    assert z.filter("is_outlier").count() == 0  # masked
    m = mad_outliers(df, ["k"], "v").collect()[0]
    assert m["n_outliers"] == 15


def test_mad_multiple_groups_independent(spark):
    from nahuatl_data_pipeline_spark.operators.anomaly import mad_outliers

    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)] + [
        ("b", 5.0) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["k"]: r for r in mad_outliers(df, ["k"], "v").collect()}
    assert got["a"]["n_outliers"] == 1
    # constant group: MAD=0 → cut=0 → no absdev exceeds it
    assert got["b"]["group_mad"] == 0.0
    assert got["b"]["n_outliers"] == 0


# ---------------------------------------------------------------------------
# winsorized_stats
# ---------------------------------------------------------------------------


def test_winsorize_bounds_tail_influence(spark):
    """1..99 plus one 1e9: the winsorized mean stays near the raw
    99-row mean while the naive mean is dragged 7 orders of magnitude;
    exactly the tail rows are counted as clamped."""
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        winsorized_stats,
    )

    rows = [("g", float(v)) for v in range(1, 100)] + [("g", 1e9)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = winsorized_stats(df, ["k"], "v").collect()[0]
    assert r["n_rows"] == 100
    assert r["lo"] < 10 and r["hi"] < 100.0  # p95 of the bulk
    assert 40 < r["winsorized_mean"] < 60  # near the bulk mean
    assert r["n_clamped"] == 10  # 5% each tail of 100 rows


def test_winsorize_constant_group_untouched(spark):
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        winsorized_stats,
    )

    df = spark.createDataFrame([("g", 7.0)] * 20, ["k", "v"])
    r = winsorized_stats(df, ["k"], "v").collect()[0]
    assert r["lo"] == r["hi"] == 7.0
    assert r["winsorized_mean"] == 7.0
    assert r["n_clamped"] == 0


def test_mad_and_winsorize_keep_null_key_group(spark):
    """NULL group keys are real groups (module contract): both robust
    operators must emit a stats row for them, not drop the rows in a
    plain equi-join."""
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        mad_outliers,
        winsorized_stats,
    )

    rows = [(None, float(v)) for v in range(1, 10)] + [(None, 1000.0)] + [
        ("g", 5.0)
    ] * 3
    df = spark.createDataFrame(rows, ["k", "v"])
    m = {r["k"]: r for r in mad_outliers(df, ["k"], "v").collect()}
    assert set(m) == {None, "g"}
    assert m[None]["n_outliers"] == 1
    w = {r["k"]: r for r in winsorized_stats(df, ["k"], "v").collect()}
    assert set(w) == {None, "g"}
    assert w[None]["n_rows"] == 10


def test_winsorize_null_values_stay_null(spark):
    """A NULL value must not be fabricated into the p05 bound (Spark's
    greatest/least skip NULLs): excluded from mean/sum/clamp count,
    still counted in n_rows."""
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        winsorized_stats,
    )

    rows = [("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", None)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = winsorized_stats(df, ["k"], "v").collect()[0]
    assert r["n_rows"] == 4
    assert r["n_clamped"] == 2  # p05/p95 of 3 values clamp the two ends
    # mean over the 3 real values' clamped forms only — no fourth datum
    assert abs(r["winsorized_sum"] - 3 * r["winsorized_mean"]) < 0.02


def test_mad_all_null_group_reports_zero_outliers(spark):
    from nahuatl_data_pipeline_spark.operators.anomaly import mad_outliers

    rows = [("g", None), ("g", None)]
    df = spark.createDataFrame(rows, schema="k string, v double")
    r = mad_outliers(df, ["k"], "v").collect()[0]
    assert r["n_outliers"] == 0  # SUM(CASE…ELSE 0) contract, not NULL
    assert r["group_median"] is None


# ---------------------------------------------------------------------------
# weighted_quantile
# ---------------------------------------------------------------------------


def test_weighted_median_hand_case(spark):
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        weighted_quantile,
    )

    # values 1..4 with weights 1,1,5,1: half of total mass (8) is 4,
    # reached at value 3 (cum 1,2,7,8)
    rows = [("g", 1.0, 1.0, 1), ("g", 2.0, 1.0, 2),
            ("g", 3.0, 5.0, 3), ("g", 4.0, 1.0, 4)]
    df = spark.createDataFrame(rows, ["g", "v", "w", "id"])
    row = weighted_quantile(
        df, ["g"], "v", "w", q=0.5, tiebreak=["id"]
    ).collect()[0]
    assert row["wq"] == 3.0 and row["total_w"] == 8.0


def test_weighted_quantile_unit_weights_match_unweighted_lower(spark):
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.operators.anomaly import (
        weighted_quantile,
    )

    df = spark.createDataFrame(
        [("g", float(v), 1.0, v) for v in range(1, 101)],
        ["g", "v", "w", "id"],
    )
    row = weighted_quantile(
        df, ["g"], "v", "w", q=0.25, tiebreak=["id"]
    ).collect()[0]
    # lower weighted quantile with unit weights = ceil(q*n)-th value
    assert row["wq"] == 25.0


def test_weighted_quantile_nulls_drop_and_groups_isolate(spark):
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        weighted_quantile,
    )

    rows = [
        ("a", 10.0, 1.0, 1),
        ("a", None, 9.0, 2),
        ("a", 20.0, None, 3),
        ("b", 5.0, 2.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "g: string, v: double, w: double, id: bigint"
    )
    out = {r["g"]: r for r in weighted_quantile(
        df, ["g"], "v", "w", q=0.5, tiebreak=["id"]).collect()}
    assert out["a"]["wq"] == 10.0 and out["a"]["total_w"] == 1.0
    assert out["b"]["wq"] == 5.0


def test_weighted_quantile_band_count_invariant(spark):
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        weighted_quantile,
    )

    rows = [
        ("g" + str(v % 3), float((v * 37) % 101), float(1 + v % 9), v)
        for v in range(300)
    ]
    df = spark.createDataFrame(rows, ["g", "v", "w", "id"])

    def run(b):
        return {
            r["g"]: (r["wq"], r["total_w"])
            for r in weighted_quantile(
                df, ["g"], "v", "w", q=0.5, tiebreak=["id"], bands=b
            ).collect()
        }

    assert run(1) == run(8) == run(64)


def test_weighted_quantile_multi_qs_matches_single_calls(spark):
    """qs= multi-quantile mode (r13) returns exactly the per-q values
    of separate single-q calls, from one pass."""
    from nahuatl_data_pipeline_spark.operators.anomaly import (
        weighted_quantile,
    )

    rows = [
        ("g" + str(v % 2), float((v * 17) % 53), float(1 + v % 5), v)
        for v in range(200)
    ]
    df = spark.createDataFrame(rows, ["g", "v", "w", "id"])
    multi = {
        r["g"]: r
        for r in weighted_quantile(
            df, ["g"], "v", "w", qs=[0.25, 0.5, 0.9], tiebreak=["id"]
        ).collect()
    }
    for i, qq in enumerate([0.25, 0.5, 0.9]):
        single = {
            r["g"]: r
            for r in weighted_quantile(
                df, ["g"], "v", "w", q=qq, tiebreak=["id"]
            ).collect()
        }
        for g in single:
            assert multi[g][f"wq_{i}"] == single[g]["wq"]
            assert multi[g]["total_w"] == single[g]["total_w"]
