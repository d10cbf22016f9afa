"""token_window_chunks (functions/segmentation.py) + water_fill
(operators/mixing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.segmentation import (
    token_window_chunks,
)
from nahuatl_data_pipeline_spark.operators.mixing import water_fill


def _chunks(spark, text, chunk_tokens, overlap):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = (
        token_window_chunks(
            df, "doc_id", "text",
            chunk_tokens=chunk_tokens, overlap=overlap,
        )
        .orderBy("chunk_idx")
        .collect()
    )
    return [(r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in rows]


def test_chunks_cover_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _chunks(spark, text, chunk_tokens=4, overlap=1)
    # stride 3: starts 0,3,6 -> [0:4],[3:7],[6:10]
    assert got == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t6 t7 t8 t9", 4),
    ]
    # consecutive chunks share exactly `overlap` tokens
    for (_, a, _), (_, b, _) in zip(got, got[1:]):
        assert a.split()[-1:] == b.split()[:1]


def test_chunks_short_doc_single_window(spark):
    got = _chunks(spark, "a b", chunk_tokens=8, overlap=2)
    assert got == [(0, "a b", 2)]


def test_chunks_ragged_tail(spark):
    text = " ".join(f"t{i}" for i in range(11))
    got = _chunks(spark, text, chunk_tokens=4, overlap=1)
    # starts 0,3,6,9 -> last window holds the 2-token remainder
    assert [g[2] for g in got] == [4, 4, 4, 2]
    assert got[-1][1] == "t9 t10"


def test_chunks_exact_boundary_no_empty_tail(spark):
    # n == chunk_tokens: exactly one window, never a zero-token tail
    text = " ".join(f"t{i}" for i in range(4))
    assert _chunks(spark, text, chunk_tokens=4, overlap=1) == [
        (0, "t0 t1 t2 t3", 4)
    ]


def test_chunks_whitespace_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "  a   b  "), (2, ""), (3, None), (4, " \t\n ")],
        ["doc_id", "text"],
    )
    rows = token_window_chunks(df, "doc_id", "text", 4, 1).collect()
    # token-less docs emit nothing; multi-whitespace normalizes
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(1, "a b")]


def test_chunks_validates_overlap(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        token_window_chunks(df, "doc_id", "text", 4, 4)
    with pytest.raises(ValueError):
        token_window_chunks(df, "doc_id", "text", 4, -1)


def _alloc(spark, avails, budget):
    df = spark.createDataFrame(
        [(f"s{i}", a) for i, a in enumerate(avails)], ["k", "a"]
    )
    return {
        r["k"]: (r["avail"], r["alloc"])
        for r in water_fill(df, "k", "a", budget).collect()
    }


def test_water_fill_mixed_branches(spark):
    # avails 10, 20, 100 with budget 60: 10 full, then level c with
    # 10 + 2c = 60 -> c = 25 (>20? no: check 20 full: 10+20*2=50<=60
    # full) -> k=2, c = (60-30)/1 = 30
    got = _alloc(spark, [10, 20, 100], 60)
    assert got["s0"] == (10, 10.0)
    assert got["s1"] == (20, 20.0)
    assert got["s2"] == (100, 30.0)
    assert sum(v[1] for v in got.values()) == 60.0


def test_water_fill_budget_exceeds_total(spark):
    got = _alloc(spark, [5, 7], 100)
    assert got["s0"] == (5, 5.0) and got["s1"] == (7, 7.0)


def test_water_fill_all_leveled(spark):
    # budget below m * min(avail): nobody full, everyone budget/m
    got = _alloc(spark, [50, 60, 70], 30)
    assert [v[1] for v in got.values()] == [10.0, 10.0, 10.0]


def test_water_fill_conserves_budget(spark):
    got = _alloc(spark, [3, 141, 59, 26, 535], 200)
    assert sum(v[1] for v in got.values()) == pytest.approx(200, abs=1e-3)
    # no source exceeds its availability
    for avail, alloc in got.values():
        assert alloc <= avail + 1e-9


def test_water_fill_rejects_negative_budget(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "a"])
    with pytest.raises(ValueError):
        water_fill(df, "k", "a", -1)


def test_match_distribution_exact_proportions(spark):
    from nahuatl_data_pipeline_spark.operators.mixing import (
        match_distribution,
    )

    # corpus: 300 rows bucket A, 100 bucket B; reference: 1:1 ->
    # A thinned to ~B's kept size, B (binding stratum) kept whole
    rows = [(i, "A") for i in range(300)] + [(i + 1000, "B") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "b"])
    ref = spark.createDataFrame(
        [(0, "A"), (1, "B")], ["doc_id", "b"]
    )
    kept = match_distribution(df, "b", ref, key="doc_id").groupBy("b").count()
    got = {r["b"]: r["count"] for r in kept.collect()}
    assert got["B"] == 100  # binding stratum keeps everything
    # A's keep rate is 1/3: hash draw keeps ~100 of 300 (binomial slack)
    assert 70 <= got["A"] <= 130


def test_match_distribution_absent_stratum_dropped(spark):
    from nahuatl_data_pipeline_spark.operators.mixing import (
        match_distribution,
    )

    df = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "C")], ["doc_id", "b"]
    )
    ref = spark.createDataFrame([(9, "A")], ["doc_id", "b"])
    kept = match_distribution(df, "b", ref, key="doc_id").collect()
    assert all(r["b"] == "A" for r in kept)  # C absent from ref -> rate 0
    assert len(kept) == 2  # A is the only (binding) stratum: rate 1


def test_match_distribution_deterministic_across_partitions(spark):
    from nahuatl_data_pipeline_spark.operators.mixing import (
        match_distribution,
    )

    rows = [(i, "A" if i % 3 else "B") for i in range(200)]
    df1 = spark.createDataFrame(rows, ["doc_id", "b"])
    df9 = df1.repartition(9)
    ref = spark.createDataFrame(
        [(i, "A" if i % 2 else "B") for i in range(50)], ["doc_id", "b"]
    )
    k1 = sorted(r["doc_id"] for r in match_distribution(df1, "b", ref, "doc_id").collect())
    k9 = sorted(r["doc_id"] for r in match_distribution(df9, "b", ref, "doc_id").collect())
    assert k1 == k9 and len(k1) > 0
