"""Gold-standard audit (operators/audit.py + CLI `audit`): hand-computed
metrics, verdict tiers, deterministic sample, markdown artifact."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.cli import main
from nahuatl_data_pipeline_spark.operators.audit import (
    audit_gold_standard,
    audit_metrics,
    audit_sample,
    audit_score,
    render_audit_markdown,
)


def _sft(spark, rows):
    return spark.createDataFrame(rows, "es string, nah string")


def test_metrics_hand_computed(spark):
    df = _sft(
        spark,
        [
            ("hola amigo", "niltze icniuhtli"),
            ("hola amigo", "niltze icniuhtli"),  # exact duplicate
            ("hola amigo", "otra cosa distinta aqui"),  # source dup only
            ("  ", "corta"),  # empty source, short target
            ("adios", None),  # null target (len NULL → not short-counted)
        ],
    )
    m = audit_metrics(df, "es", "nah")
    assert m["total_rows"] == 5
    assert m["null_values"] == 1
    assert m["empty_source"] == 1
    assert m["empty_target"] == 0
    assert m["exact_duplicates"] == 1  # 5 rows, 4 distinct full rows
    assert m["source_duplicates"] == 2  # 5 rows, 3 distinct sources
    assert m["short_targets"] == 1  # "corta" (5) — NULL target excluded
    assert m["src_len_max"] == 10 and m["src_len_min"] == 2


def test_score_tiers_match_reference_deductions():
    base = dict(
        total_rows=20_000,
        null_values=0,
        exact_duplicates=0,
        source_duplicates=0,
        short_targets=0,
    )
    assert audit_score(base) == (100, "PASS")
    assert audit_score({**base, "total_rows": 500}) == (70, "PASS_WITH_RESERVATIONS")
    assert audit_score(
        {
            **base,
            "total_rows": 500,
            "null_values": 3,
            "exact_duplicates": 501,
            "source_duplicates": 2001,
            "short_targets": 1001,
        }
    ) == (30, "FAIL")


def test_sample_is_deterministic_and_bounded(spark):
    df = _sft(spark, [(f"src {i}", f"tgt {i}") for i in range(50)])
    a = audit_sample(df, "es", "nah", k=5)
    b = audit_sample(df.repartition(7), "es", "nah", k=5)
    assert a == b and len(a) == 5  # partitioning-independent


def test_schema_cascade_and_markdown(spark):
    df = spark.createDataFrame(
        [("in text", "out text")], "input string, output string"
    )
    res = audit_gold_standard(df, min_rows=1)
    assert res.metrics["source_col"] == "input"
    assert res.metrics["schema_standard"] is True
    md = render_audit_markdown(res, source_path="x.parquet")
    assert "# Gold-standard audit: x.parquet" in md
    assert f"score {res.score}/100" in md
    assert "`in text` → `out text`" in md


def test_nonstandard_schema_flagged(spark):
    df = spark.createDataFrame([("a", "b")], "foo string, bar string")
    res = audit_gold_standard(df, min_rows=1)
    assert res.metrics["schema_standard"] is False
    assert "NON-standard" in render_audit_markdown(res)


def test_cli_audit_exit_codes_and_artifact(spark, tmp_path, capsys):
    good = str(tmp_path / "good.parquet")
    _sft(spark, [(f"s{i}", f"long target {i}") for i in range(40)]).write.parquet(good)
    rpt = str(tmp_path / "report.md")
    rc = main(["audit", "--input", good, "--min-rows", "10", "--report", rpt])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["verdict"] == "PASS" and out["score"] == 100
    assert "Verdict: PASS" in open(rpt).read()

    # bad: trips the reference's fixed deduction thresholds — volume
    # (<10k, -30), >500 exact dupes, >2000 repeated sources, >1000
    # short targets (-10 each) → score 40 → FAIL, rc 1
    bad = str(tmp_path / "bad.parquet")
    _sft(spark, [("s", "x")] * 2500).write.parquet(bad)
    rc = main(["audit", "--input", bad])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["verdict"] == "FAIL"
    assert out["score"] == 40
    assert out["metrics"]["exact_duplicates"] == 2499
    assert out["metrics"]["short_targets"] == 2500


def test_null_sources_count_pandas_style(spark):
    # pandas duplicated(subset=[src]).sum() treats NaN == NaN: k null
    # sources are ONE distinct value → k-1 duplicates, not k (ADVICE
    # round 8). 3 nulls + 2 distinct non-null → 5 rows, 3 distinct → 2.
    df = _sft(
        spark,
        [
            (None, "a"),
            (None, "b"),
            (None, "c"),
            ("x", "d"),
            ("y", "e"),
        ],
    )
    m = audit_metrics(df, "es", "nah")
    assert m["source_duplicates"] == 2
    # and with no nulls the count is unchanged from plain countDistinct
    m2 = audit_metrics(_sft(spark, [("x", "a"), ("x", "b")]), "es", "nah")
    assert m2["source_duplicates"] == 1
