"""bench.py's host-calibration probe + drift-normalized comparison
(round-11 verdict #1): three straight rounds lost forensic time to
co-tenant wall-clock swings — BENCH JSONs now carry an md5-throughput
stamp so cross-round ratios can be normalized arithmetically."""

from __future__ import annotations

import json

import bench


def test_probe_returns_positive_rates():
    cal = bench._calibration_probe(seconds=0.05, workers=2)
    assert cal["mhash_1t"] > 0
    assert cal["mhash_allw"] > 0
    assert cal["workers"] == 2
    # 2 workers should not be SLOWER in aggregate than one thread by
    # more than scheduling noise (loose sanity, not a perf assertion)
    assert cal["mhash_allw"] > cal["mhash_1t"] * 0.5


def test_merge_calibration_brackets():
    s = {"mhash_1t": 10.0, "mhash_allw": 100.0, "workers": 32}
    e = {"mhash_1t": 12.0, "mhash_allw": 140.0, "workers": 32}
    merged = bench._merge_calibration(s, e)
    assert merged == {
        "mhash_1t": [10.0, 12.0],
        "mhash_allw": [100.0, 140.0],
        "workers": 32,
    }
    # one-sided brackets degrade to the available probe
    assert bench._merge_calibration(s, None)["mhash_allw"] == [100.0, 100.0]
    assert bench._merge_calibration(None, None) is None


def test_compare_normalizes_host_drift(tmp_path):
    """Equal engines on a 1.44x-slower host: raw ratio 1.44, host ratio
    0.694, normalized ratio 1.0 — the SCALE.md round-11 forensic
    conclusion, now one arithmetic step."""
    a = {
        "queries": {"q01": 1.0, "q02": 2.0, "q99": 4.0},
        "calibration": {"mhash_1t": [1.8, 1.8], "mhash_allw": [52.0, 52.0]},
    }
    b = {
        "queries": {"q01": 1.444, "q02": 2.889, "q03": 9.0},
        "calibration": {"mhash_1t": [1.3, 1.2], "mhash_allw": [36.0, 36.0]},
    }
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    out = bench._compare_benches(str(pa), str(pb))
    assert out["common_queries"] == 2  # q99/q03 are not common
    assert out["raw_ratio"] == 1.444
    assert out["host_ratio"] == round(36.0 / 52.0, 3)
    assert abs(out["normalized_ratio"] - 1.0) < 0.01
    assert set(out["top_deviations"]) <= {"q01", "q02"}


def test_compare_without_calibration_reports_raw_only(tmp_path):
    a = {"queries": {"q01": 1.0}}
    b = {"queries": {"q01": 2.0}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    out = bench._compare_benches(str(pa), str(pb))
    assert out["raw_ratio"] == 2.0
    assert "normalized_ratio" not in out


def test_compare_reads_driver_tail_format(tmp_path):
    """BENCH_rN.json is the driver's wrapper: the stdout line's LAST
    2000 chars under "tail" — queries and the trailing compact "cal"
    stamp must be regex-recovered (head-truncated entries absent)."""
    tail_a = (
        '":0.74,"q05":1.0,"q06":2.0,"metric":"headline_queries_total",'
        '"value":3.7,"unit":"sec","sf":0.1,"cal":[1.8,1.8,52.0,52.0,32]}'
    )
    b = {
        "queries": {"q05": 1.444, "q06": 2.889},
        "cal": [1.3, 1.2, 36.0, 36.0, 32],
    }
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps({"n": 10, "rc": 0, "tail": tail_a}))
    pb.write_text(json.dumps(b))
    out = bench._compare_benches(str(pa), str(pb))
    assert out["common_queries"] == 2  # the head-truncated entry is lost
    assert out["raw_ratio"] == 1.444
    assert out["host_ratio"] == round(36.0 / 52.0, 3)
    assert abs(out["normalized_ratio"] - 1.0) < 0.01
