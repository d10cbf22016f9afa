"""ohlc_downsample / transition_counts unit tests
(operators/timeseries.py): tiebreak determinism, bar alignment, plan
shape (hash aggregate, never a per-bar row_number window), and
transition ordering."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.timeseries import (
    ohlc_downsample,
    transition_counts,
)

_T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _ticks(spark):
    rows = [
        # (event_id, ts, series, value) — two bars for series "x"
        (1, _T0, "x", 5.0),
        (2, _T0, "x", 3.0),  # same ts as id=1: open must pick id=1
        (3, _T0 + dt.timedelta(minutes=30), "x", 9.0),
        (4, _T0 + dt.timedelta(minutes=59), "x", 1.0),
        (5, _T0 + dt.timedelta(hours=1), "x", 7.0),
        (6, _T0 + dt.timedelta(minutes=10), "y", 2.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "series", "value"])
    return spark.createDataFrame(
        pdf, schema="event_id long, ts timestamp, series string, value double"
    )


def test_ohlc_values_and_tiebreak(spark):
    out = ohlc_downsample(
        _ticks(spark), ts="ts", value="value", by=["series"],
        width="1 hour", tiebreak=["event_id"],
    )
    bars = {(r["series"], r["bar_ts"]): r for r in out.collect()}
    b = bars[("x", _T0)]
    # open = id 1 (tiebreak at equal ts), close = id 4, high/low global
    assert (b["open"], b["high"], b["low"], b["close"], b["volume"]) == (
        5.0, 9.0, 1.0, 1.0, 4
    )
    assert bars[("x", _T0 + dt.timedelta(hours=1))]["volume"] == 1
    assert bars[("y", _T0)]["open"] == 2.0
    assert len(bars) == 3


def test_ohlc_plan_is_hash_agg_not_window(spark):
    out = ohlc_downsample(
        _ticks(spark), ts="ts", value="value", by=["series"],
        width="1 hour", tiebreak=["event_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan
    assert "Window" not in plan
    # map-side partial combine before the single bar-keyed exchange
    assert "partial_min" in plan or "partial_min_by" in plan or "min_by" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_transition_counts(spark):
    rows = [
        (1, 1, _T0, "a"),
        (2, 1, _T0 + dt.timedelta(seconds=1), "b"),
        (3, 1, _T0 + dt.timedelta(seconds=2), "a"),
        (4, 2, _T0, "a"),
        (5, 2, _T0 + dt.timedelta(seconds=1), "b"),
        (6, 3, _T0, "c"),  # single event: no transition
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "state"])
    df = spark.createDataFrame(
        pdf,
        schema="event_id long, user_id long, ts timestamp, state string",
    )
    out = transition_counts(
        df, by="user_id", state="state", order_by=["ts", "event_id"]
    )
    got = {
        (r["prev_state"], r["next_state"]): r["n_transitions"]
        for r in out.collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_transition_equal_ts_tiebreak_deterministic(spark):
    # two events at the SAME timestamp: event_id tiebreak fixes the order
    rows = [(2, 1, _T0, "b"), (1, 1, _T0, "a")]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "state"])
    df = spark.createDataFrame(
        pdf,
        schema="event_id long, user_id long, ts timestamp, state string",
    ).repartition(4)
    out = transition_counts(
        df, by="user_id", state="state", order_by=["ts", "event_id"]
    )
    assert [tuple(r) for r in out.collect()] == [("a", "b", 1)]


# ---------------------------------------------------------------------------
# ewma_last
# ---------------------------------------------------------------------------


def test_ewma_hand_computed_in_timestamp_order(spark):
    """Rows arrive shuffled; fold must follow (ts, tiebreak):
    1 → 0.2·2+0.8·1 = 1.2 → 0.2·3+0.8·1.2 = 1.56."""
    from nahuatl_data_pipeline_spark.operators.timeseries import ewma_last

    rows = [
        ("g", 3, "c", 3.0),
        ("g", 1, "a", 1.0),
        ("g", 2, "b", 2.0),
    ]
    df = spark.createDataFrame(rows, ["k", "t", "tb", "value"])
    r = ewma_last(
        df, ["k"], ts_col="t", value_col="value", order_tiebreak="tb",
        alpha=0.2,
    ).collect()[0]
    assert r["ewma"] == 1.56
    assert r["n"] == 3


def test_ewma_partition_independent(spark):
    from nahuatl_data_pipeline_spark.operators.timeseries import ewma_last

    rows = [("g", i, str(i), float(i % 13)) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "t", "tb", "value"])
    a = ewma_last(df, ["k"], "t", "value", "tb").collect()[0]["ewma"]
    b = ewma_last(df.repartition(17), ["k"], "t", "value", "tb").collect()[0][
        "ewma"
    ]
    assert a == b  # canonical fold order → bit-identical result


def test_ewma_skips_null_values(spark):
    """A NULL value must not poison the fold (astype-float would turn
    it into NaN and NaN every later step); it is skipped like SQL
    aggregates skip NULLs, and n counts folded values only."""
    from nahuatl_data_pipeline_spark.operators.timeseries import ewma_last

    rows = [
        ("g", 1, "a", 1.0),
        ("g", 2, "b", None),
        ("g", 3, "c", 2.0),
        ("g", 4, "d", 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, t int, tb string, value double")
    r = ewma_last(df, ["k"], "t", "value", "tb", alpha=0.2).collect()[0]
    assert r["ewma"] == 1.56  # fold over [1, 2, 3] only
    assert r["n"] == 3


# ---------------------------------------------------------------------------
# path_ngrams / gap_stats
# ---------------------------------------------------------------------------


def test_path_ngrams_hand_sequence(spark):
    from nahuatl_data_pipeline_spark.operators.timeseries import path_ngrams

    # user 1: A B A B A  -> trigrams ABA, BAB, ABA
    # user 2: A B        -> too short for n=3
    rows = [(1, i, s) for i, s in enumerate("ABABA")] + [
        (2, 0, "A"),
        (2, 1, "B"),
    ]
    df = spark.createDataFrame(rows, ["u", "seq", "s"])
    out = {
        (r["s1"], r["s2"], r["s3"]): r["n_paths"]
        for r in path_ngrams(df, "u", "s", ["seq"], n=3).collect()
    }
    assert out == {("A", "B", "A"): 2, ("B", "A", "B"): 1}


def test_path_ngrams_null_state_symmetric(spark):
    """A NULL state value emits no path at ANY position: it neither
    appears as sn nor as a lag — symmetric boundary handling for
    nullable state columns."""
    from nahuatl_data_pipeline_spark.operators.timeseries import path_ngrams

    # user 1: A B NULL C D -> only trigram fully inside non-null runs
    # would be (NULL,C,D)/(B,NULL,C)/(A,B,NULL): all excluded; no
    # 3-run of consecutive non-null states exists except none.
    rows = [(1, 0, "A"), (1, 1, "B"), (1, 2, None), (1, 3, "C"), (1, 4, "D"),
            (2, 0, "X"), (2, 1, "Y"), (2, 2, "Z")]
    df = spark.createDataFrame(rows, "u long, seq long, s string")
    out = {
        (r["s1"], r["s2"], r["s3"]): r["n_paths"]
        for r in path_ngrams(df, "u", "s", ["seq"], n=3).collect()
    }
    assert out == {("X", "Y", "Z"): 1}


def test_path_ngrams_n2_equals_transition_counts(spark):
    from nahuatl_data_pipeline_spark.operators.timeseries import (
        path_ngrams,
        transition_counts,
    )

    rows = [(i % 5, i, f"t{(i * 7) % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, ["u", "seq", "s"])
    a = {
        (r["s1"], r["s2"]): r["n_paths"]
        for r in path_ngrams(df, "u", "s", ["seq"], n=2).collect()
    }
    b = {
        (r["prev_state"], r["next_state"]): r["n_transitions"]
        for r in transition_counts(df, "u", "s", ["seq"]).collect()
    }
    assert a == b


def test_gap_stats_exact_micros(spark):
    import datetime

    from nahuatl_data_pipeline_spark.operators.timeseries import gap_stats

    t0 = datetime.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    # one user, gaps of 10s then 30s; group by type of the LATER event
    rows = [
        (1, 0, ts(0), "a"),
        (1, 1, ts(10), "b"),
        (1, 2, ts(40), "b"),
    ]
    df = spark.createDataFrame(rows, ["u", "eid", "ts", "et"])
    out = {
        r["et"]: r
        for r in gap_stats(df, "u", "ts", ["ts", "eid"], "et").collect()
    }
    assert "a" not in out  # first event has no gap
    assert out["b"]["n_gaps"] == 2
    assert out["b"]["p50_us"] == 20_000_000.0  # midpoint of 10s and 30s
    assert out["b"]["mean_us"] == 20_000_000.0


def test_sessionize_batch_boundaries_and_counts(spark):
    import datetime

    from nahuatl_data_pipeline_spark.operators.timeseries import (
        sessionize_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        (1, 0, ts(0)),
        (1, 1, ts(10)),   # same session (10 min gap)
        (1, 2, ts(50)),   # 40 min gap -> new session
        (1, 3, ts(55)),
        (2, 4, ts(0)),    # other user: own session 0
    ]
    df = spark.createDataFrame(rows, ["u", "eid", "ts"])
    out = {
        (r["u"], r["eid"]): r["session_idx"]
        for r in sessionize_batch(
            df, "u", "ts", ["ts", "eid"], gap_seconds=1800
        ).collect()
    }
    assert out == {(1, 0): 0, (1, 1): 0, (1, 2): 1, (1, 3): 1, (2, 4): 0}


def test_sessionize_batch_exact_gap_is_same_session(spark):
    import datetime

    from nahuatl_data_pipeline_spark.operators.timeseries import (
        sessionize_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, 0, t0), (1, 1, t0 + datetime.timedelta(seconds=1800))]
    df = spark.createDataFrame(rows, ["u", "eid", "ts"])
    out = sessionize_batch(df, "u", "ts", ["ts", "eid"], 1800).collect()
    # strict > gap: exactly gap_seconds stays in-session
    assert {r["session_idx"] for r in out} == {0}
