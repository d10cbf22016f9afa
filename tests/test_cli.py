"""CLI entry-point tests (reference tests/unit/test_cli.py analogue) —
in-process main() calls against tmp data."""

from __future__ import annotations

import json

import pytest

from nahuatl_data_pipeline_spark.cli import main
from nahuatl_data_pipeline_spark.plans.metadata import MetadataStore, MetricsTracker


@pytest.fixture()
def silver_dir(tmp_path):
    d = tmp_path / "silver"
    d.mkdir()
    rows = [
        {"es": f"frase de ejemplo {i}", "nah": f"tlahtolli {i}", "source": "m"}
        for i in range(20)
    ]
    with open(d / "a.jsonl", "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return str(d)


def test_cli_run(spark, silver_dir, tmp_path, capsys):
    rc = main(
        [
            "run",
            "--layer", f"silver={silver_dir}",
            "--out", str(tmp_path / "gold"),
            "--seed", "7",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input"] == 20 and stats["output"] == 20
    assert (tmp_path / "gold" / "split=train").exists()


def test_cli_quality_gate_exit_codes(spark, tmp_path, capsys):
    ok = spark.createDataFrame([("a",), ("b",)], ["t"])
    p_ok = str(tmp_path / "ok")
    ok.write.parquet(p_ok)
    assert main(["quality", "--input", p_ok]) == 0
    bad = spark.createDataFrame([(None,), (None,)], "t string")
    p_bad = str(tmp_path / "bad")
    bad.write.parquet(p_bad)
    assert main(["quality", "--input", p_bad]) == 1  # all-null column fails


def test_cli_query_known_and_unknown(spark, capsys):
    assert main(["query", "q14_top_sources"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and json.loads(out[0])["count"] >= 1
    assert main(["query", "nope"]) == 2


def test_metrics_tracker(spark, tmp_path):
    store = MetadataStore(spark, str(tmp_path / "meta"))
    run_id = store.start_run("op")
    with MetricsTracker(store, "ingest", run_id) as t:
        t.record("records_processed", 123)
    m = {r["metric_name"]: r["metric_value"] for r in store.metrics().collect()}
    assert m["records_processed"] == 123.0
    assert m["ingest_seconds"] >= 0.0 and m["ingest_failed"] == 0.0

    with pytest.raises(RuntimeError):
        with MetricsTracker(store, "boom", run_id):
            raise RuntimeError("x")
    m2 = {
        (r["metric_name"]): r["metric_value"]
        for r in store.metrics().collect()
        if r["metric_name"].startswith("boom")
    }
    assert m2["boom_failed"] == 1.0
