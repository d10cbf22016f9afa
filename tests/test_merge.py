"""SCD1 upsert / SCD2 merge unit tests (operators/merge.py): change
detection, no-op re-sends, inserts, null transitions, and the
broadcast-only plan contract."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.merge import scd2_merge, upsert

SCHEMA = "k long, attr string, val double"


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "attr", "val"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


def test_upsert_updates_win_and_inserts(spark):
    base = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    updates = _df(spark, [(2, "B", 20.0), (4, "d", 4.0)])
    got = sorted(map(tuple, upsert(base, updates, ["k"]).collect()))
    assert got == [(1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0), (4, "d", 4.0)]


def test_scd2_versions_only_real_changes(spark):
    base = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    updates = _df(
        spark,
        [
            (1, "a", 1.0),  # no-op re-send: must NOT version
            (2, "b", 20.0),  # tracked change
            (9, "new", 9.0),  # brand-new key
        ],
    )
    out = scd2_merge(base, updates, keys=["k"], tracked=["val"])
    got = sorted(map(tuple, out.select("k", "val", "version", "is_current").collect()))
    assert got == [
        (1, 1.0, 1, True),  # no-op: single current v1
        (2, 2.0, 1, False),  # superseded history row
        (2, 20.0, 2, True),  # new current version
        (3, 3.0, 1, True),  # untouched
        (9, 9.0, 2, True),  # insert, no history row
    ]


def test_scd2_null_transitions_are_changes(spark):
    base = _df(spark, [(1, "a", None), (2, "b", 2.0)])
    updates = _df(spark, [(1, "a", 1.0), (2, "b", None)])
    out = scd2_merge(base, updates, keys=["k"], tracked=["val"])
    current = {
        r["k"]: r["val"]
        for r in out.filter(F.col("is_current")).collect()
    }
    assert current == {1: 1.0, 2: None}
    assert out.filter(~F.col("is_current")).count() == 2


def test_scd2_untracked_change_is_noop(spark):
    base = _df(spark, [(1, "a", 1.0)])
    updates = _df(spark, [(1, "DIFFERENT", 1.0)])  # attr not tracked
    out = scd2_merge(base, updates, keys=["k"], tracked=["val"])
    assert out.count() == 1
    assert out.first()["is_current"] is True


def test_merge_plans_broadcast_not_sortmerge(spark):
    """The base side must never shuffle: every join in both merges rides
    a broadcast of the (small) update-derived side."""
    base = _df(spark, [(i, "a", float(i)) for i in range(100)])
    updates = _df(spark, [(1, "a", 100.0)])
    for out in (
        upsert(base, updates, ["k"]),
        scd2_merge(base, updates, keys=["k"], tracked=["val"]),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan


def test_merge_gate_fallback_matches_broadcast_path(spark):
    """Forcing the size gate to fail (max_updates=0) must change only
    the join strategy, never the merged result."""
    base = _df(spark, [(i, "a", float(i)) for i in range(50)])
    updates = _df(spark, [(1, "a", 100.0), (99, "z", 9.0)])
    fast = sorted(map(tuple, upsert(base, updates, ["k"]).collect()))
    slow = sorted(
        map(
            tuple,
            upsert(base, updates, ["k"], broadcast_max_updates=0).collect(),
        )
    )
    assert fast == slow
    fast2 = sorted(
        map(
            tuple,
            scd2_merge(base, updates, keys=["k"], tracked=["val"]).collect(),
        )
    )
    slow2 = sorted(
        map(
            tuple,
            scd2_merge(
                base, updates, keys=["k"], tracked=["val"],
                broadcast_max_updates=0,
            ).collect(),
        )
    )
    assert fast2 == slow2


def test_scd2_base_scanned_once_in_output_plan(spark, tmp_path):
    """The matched/changed key sets are materialized (localCheckpoint),
    so the output plan must read the base table exactly ONCE (the
    tagging scan) — not re-run the base⨝updates join per leg, which
    before the fix re-scanned the base ~4×."""
    base_path = str(tmp_path / "base.parquet")
    _df(spark, [(i, "a", float(i)) for i in range(100)]).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    updates = _df(spark, [(1, "a", 100.0), (999, "z", 9.0)])
    out = scd2_merge(base, updates, keys=["k"], tracked=["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_all_statuses(spark):
    from nahuatl_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], ["id", "text"]
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, ["id"], ["text"]).collect()
    }
    assert got == {1: "unchanged", 2: "modified", 3: "removed", 4: "added"}


def test_snapshot_diff_multi_content_cols_no_aliasing(spark):
    """concat_ws with a separator: ('ab','c') must differ from
    ('a','bc') — naked concat would hash them identically."""
    from nahuatl_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "ab", "c")], ["id", "x", "y"])
    new = spark.createDataFrame([(1, "a", "bc")], ["id", "x", "y"])
    got = snapshot_diff(old, new, ["id"], ["x", "y"]).collect()
    assert got[0]["status"] == "modified"


def test_snapshot_diff_null_key_matches_null_safely(spark):
    from nahuatl_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(None, "a")], "id int, text string")
    new = spark.createDataFrame([(None, "a")], "id int, text string")
    got = snapshot_diff(old, new, ["id"], ["text"]).collect()
    assert len(got) == 1 and got[0]["status"] == "unchanged"


def test_snapshot_diff_null_column_does_not_alias(spark):
    """concat_ws drops NULLs and their separators, so without per-column
    null encoding ('a', NULL) and (NULL, 'a') would hash identically —
    and so would ('a', NULL, 'b') vs ('a', 'b', NULL)."""
    from nahuatl_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", None, "b"), (2, "x", None, None)],
        "id int, c1 string, c2 string, c3 string",
    )
    new = spark.createDataFrame(
        [(1, "a", "b", None), (2, "x", None, None)],
        "id int, c1 string, c2 string, c3 string",
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, ["id"], ["c1", "c2", "c3"]).collect()
    }
    assert got == {1: "modified", 2: "unchanged"}


def test_snapshot_diff_separator_byte_in_value_no_aliasing(spark):
    """A \x1f byte INSIDE a value must not shift column boundaries:
    ('a\x1fb', 'c') vs ('a', 'b\x1fc') is a modification."""
    from nahuatl_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a\x1fb", "c")], ["id", "x", "y"])
    new = spark.createDataFrame([(1, "a", "b\x1fc")], ["id", "x", "y"])
    got = snapshot_diff(old, new, ["id"], ["x", "y"]).collect()
    assert got[0]["status"] == "modified"
