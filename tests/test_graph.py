"""pagerank (operators/graph.py) + power_law_alpha (operators/profile.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.graph import pagerank
from nahuatl_data_pipeline_spark.operators.profile import power_law_alpha


def _ranks(df):
    return {r["node"]: r["pagerank"] for r in df.collect()}


def _numpy_pagerank(edges, damping=0.85, iters=10):
    """Reference implementation: dense synchronous iteration."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0.0) + w
    r = [1.0 / n] * n
    for _ in range(iters):
        nxt = [(1.0 - damping) / n] * n
        for s, d, w in edges:
            nxt[idx[d]] += damping * r[idx[s]] * (w / out[s])
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_dense_reference(spark):
    edges = [
        ("a", "b", 1.0),
        ("a", "c", 3.0),
        ("b", "c", 1.0),
        ("c", "a", 1.0),
        ("d", "a", 2.0),  # d is a source-only node with in-degree 0
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = _ranks(pagerank(df, weight="w"))
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), v


def test_pagerank_dangling_mass_leaks(spark):
    # b has no out-edges: its mass leaks, total rank < 1 (documented
    # simplified formulation).
    df = spark.createDataFrame([("a", "b", 1.0)], ["src", "dst", "w"])
    got = _ranks(pagerank(df, weight="w", iters=5))
    assert set(got) == {"a", "b"}
    assert sum(got.values()) < 1.0
    want = _numpy_pagerank([("a", "b", 1.0)], iters=5)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_pagerank_unweighted_parallel_edges_accumulate(spark):
    # weight=None counts each edge once: two parallel a->b edges next
    # to one a->c edge means p(a->b) = 2/3.
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")],
        ["src", "dst"],
    )
    got = _ranks(pagerank(df, iters=8))
    want = _numpy_pagerank(
        [
            ("a", "b", 2.0),
            ("a", "c", 1.0),
            ("b", "a", 1.0),
            ("c", "a", 1.0),
        ],
        iters=8,
    )
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    assert got["b"] > got["c"]


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # A directed cycle is doubly stochastic: uniform 1/n is the fixed
    # point, so every iterate stays exactly 1/n.
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    got = _ranks(pagerank(df, iters=7))
    for v in got:
        assert got[v] == pytest.approx(1.0 / 3, abs=1e-6)


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


def test_power_law_alpha_known_value(spark):
    # counts 5,5,10,20,40 at xmin=5:
    # alpha = 1 + 5 / sum(ln(c/4.5))
    counts = [5, 5, 10, 20, 40, 3, 1]  # last two below xmin -> dropped
    df = spark.createDataFrame([(c,) for c in counts], ["c"])
    row = power_law_alpha(df, "c", xmin=5).collect()[0]
    kept = [c for c in counts if c >= 5]
    want = 1.0 + len(kept) / sum(math.log(c / 4.5) for c in kept)
    assert row["n_types"] == len(kept)
    assert row["xmin"] == 5
    assert row["alpha"] == pytest.approx(want, abs=1e-6)


def test_power_law_alpha_rejects_degenerate_xmin(spark):
    df = spark.createDataFrame([(5,)], ["c"])
    with pytest.raises(ValueError):
        power_law_alpha(df, "c", xmin=1)


def test_power_law_alpha_zipf_recovers_exponent(spark):
    # A rank-frequency table following f(r) ~ r^-1 has a count
    # distribution with power-law tail alpha ~= 2; sanity-band check.
    rows = [(int(10000 / r),) for r in range(1, 400)]
    df = spark.createDataFrame(rows, ["c"])
    row = power_law_alpha(df, "c", xmin=25).collect()[0]
    assert 1.7 < row["alpha"] < 2.3


def test_pagerank_partitioning_invariance(spark):
    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
             ("a", "c", 1.0), ("c", "b", 3.0)]
    df1 = spark.createDataFrame(edges, ["src", "dst", "w"])
    df8 = df1.repartition(8)
    assert _ranks(pagerank(df1, weight="w")) == _ranks(
        pagerank(df8, weight="w")
    )


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    out = pagerank(df)
    assert out.columns == ["node", "pagerank"]
    assert out.count() == 0
