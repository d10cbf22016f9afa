"""bench.py's host-calibration probe + drift-normalized comparison
(round-11 verdict #1): three straight rounds lost forensic time to
co-tenant wall-clock swings — BENCH JSONs now carry an md5-throughput
stamp so cross-round ratios can be normalized arithmetically."""

from __future__ import annotations

import json
import os

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


def test_co_tenants_excludes_self_and_descendants():
    """The calling process (whose cmdline may contain 'pytest') and its
    own children must never count — only FOREIGN engine workloads."""
    import subprocess
    import sys
    import time

    child = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(30)",
         "own-child-shim-bench.py"],
    )
    try:
        time.sleep(0.2)
        hits = bench._co_tenant_pids()
        assert os.getpid() not in hits
        assert child.pid not in hits  # descendant of this process
    finally:
        child.kill()
        child.wait()


def test_co_tenants_detects_reparented_engine_process():
    """A bench-shaped process NOT in our process tree (reparented to
    init after its shell parent exits — how a stray backgrounded bench
    actually looks) must be counted; round 13's discarded 2.5x-deviation
    artifact is the motivating incident."""
    import subprocess
    import time

    marker = "cotenant-shim-bench.py"
    subprocess.run(
        f"nohup python -c 'import time; time.sleep(30)' {marker} "
        ">/dev/null 2>&1 &",
        shell=True,
        check=True,
    )
    try:
        found = False
        for _ in range(40):  # reparenting to init is fast but not instant
            hits = bench._co_tenant_pids()
            if any(
                marker in _cmdline(pid) for pid in hits
            ):
                found = True
                break
            time.sleep(0.25)
        if not found:
            # In environments where THIS process is the nearest reaper
            # (PID 1 in a container, or a PR_SET_CHILD_SUBREAPER test
            # harness), the orphan lands back inside our own subtree
            # and is excluded BY DESIGN — not a detection failure.
            import pytest

            parent, cmds = bench._proc_snapshot()
            decoys = [p for p, c in cmds.items() if marker in c]
            me = os.getpid()
            for d in decoys:
                chain = set()
                p = d
                while p and p in parent and p not in chain:
                    chain.add(p)
                    p = parent[p]
                if me in chain:
                    pytest.skip(
                        "test process is the orphan reaper here; the "
                        "decoy cannot leave our own subtree"
                    )
        assert found, "reparented decoy bench process was not detected"
    finally:
        subprocess.run(["pkill", "-f", marker], check=False)


def _cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\0", b" ").decode("utf-8", "replace")
    except OSError:
        return ""


def test_compare_warns_on_co_tenant_stamp(tmp_path, capsys):
    a = {"queries": {"q01": 1.0}}
    b = {"queries": {"q01": 1.1}, "co": [1, 0]}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    bench._compare_benches(str(pa), str(pb))
    assert "co-tenant" in capsys.readouterr().err

    # and the driver-tail shape carries the stamp through the regex path
    tail = '"q05":1.0,"co":[0,2],"cal":[1.0,1.0,40.0,40.0,32]}'
    pc = tmp_path / "c.json"
    pc.write_text(json.dumps({"n": 1, "rc": 0, "tail": tail}))
    bench._compare_benches(str(pa), str(pc))
    assert "co-tenant" in capsys.readouterr().err


def test_co_tenants_synthetic_topology_counts_siblings_not_own_tree():
    """Injected /proc snapshot: a sibling bench under the same shell
    supervisor and a reparented orphan MUST count; self, ancestors, and
    the own JVM/daemon subtree must not (self-review r13 — the first
    cut expanded descendants from the ancestor set and absorbed every
    sibling subtree)."""
    parent = {
        1: 0,
        10: 1,    # tmux/supervisor
        20: 10,   # my shell ancestor: `sh -c "python bench.py"`
        30: 20,   # me
        31: 30,   # my Spark JVM
        32: 31,   # pyspark.daemon worker
        40: 10,   # SIBLING subtree root: another shell
        41: 40,   # stray bench in the sibling pane
        50: 1,    # reparented orphan bench
        51: 1,    # orphaned FOREIGN pyspark.daemon worker (driver died)
        60: 1,    # unrelated process
    }
    cmds = {
        1: "/sbin/init",
        10: "tmux server",
        20: 'sh -c "python bench.py"',
        30: "python bench.py",
        31: "java org.apache.spark.deploy.SparkSubmit pyspark-shell",
        32: "python -m pyspark.daemon",
        40: "bash",
        41: "python bench.py",
        50: "python bench.py --isolate",
        51: "python -m pyspark.daemon",
        60: "vim notes.txt",
    }
    hits = bench._co_tenant_pids(snapshot=(parent, cmds), me=30)
    assert hits == {41, 50, 51}
