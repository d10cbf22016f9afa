"""span_corrupt (operators/corruption.py) + common_prefix
(operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.corruption import span_corrupt
from nahuatl_data_pipeline_spark.operators.curation import common_prefix


def test_span_corrupt_roundtrip(spark):
    """input with the sentinel replaced by the target's span tokens
    reconstructs the original token stream."""
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(3 + i))) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corrupt(df, "doc_id", "text").collect()}
    assert len(out) == 8
    for i, text in rows:
        r = out[i]
        span = r["target_text"].split(" ")[1:]  # strip sentinel
        assert len(span) == r["span_len"]
        inp = r["input_text"].split(" ")
        k = inp.index("<extra_id_0>")
        assert k == r["span_start"]
        assert inp[:k] + span + inp[k + 1 :] == text.split()


def test_span_corrupt_deterministic_and_partition_stable(spark):
    rows = [(i, f"a{i} b{i} c{i} d{i} e{i} f{i}") for i in range(20)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    df7 = df1.repartition(7)
    got1 = sorted(map(tuple, span_corrupt(df1, "doc_id", "text").collect()))
    got7 = sorted(map(tuple, span_corrupt(df7, "doc_id", "text").collect()))
    assert got1 == got7


def test_span_corrupt_short_docs_dropped_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, None), (4, "a b")],
        "doc_id long, text string",
    )
    out = span_corrupt(df, "doc_id", "text", max_span=5).collect()
    assert [r["doc_id"] for r in out] == [4]
    r = out[0]
    # n=2, span_frac 0.2 -> len = max(1, floor(0.4)) = 1
    assert r["span_len"] == 1 and 0 <= r["span_start"] <= 1


def test_span_corrupt_validates_args(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        span_corrupt(df, "doc_id", "text", max_span=0)
    with pytest.raises(ValueError):
        span_corrupt(df, "doc_id", "text", span_frac=0.0)


def test_common_prefix_detects_banner(spark):
    df = spark.createDataFrame(
        [
            ("a", "HEADER :: alpha"),
            ("a", "HEADER :: beta"),
            ("a", "HEADER :: gamma"),
            ("b", "x1"),
            ("b", "y2"),
        ],
        ["g", "t"],
    )
    got = {
        r["g"]: (r["prefix_len"], r["prefix"])
        for r in common_prefix(df, "g", "t").collect()
    }
    # lcp("HEADER :: alpha","HEADER :: gamma") = "HEADER :: "
    assert got["a"] == (10, "HEADER :: ")
    assert got["b"] == (0, "")


def test_common_prefix_single_doc_group_full_text(spark):
    df = spark.createDataFrame([("g", "whole text")], ["g", "t"])
    row = common_prefix(df, "g", "t").collect()[0]
    assert (row["prefix_len"], row["prefix"]) == (10, "whole text")


def test_common_prefix_equals_python_lcp_on_all_members(spark):
    import os

    texts = ["pre fix one", "pre fix two", "pre fluke", "pre fix"]
    df = spark.createDataFrame([("g", t) for t in texts], ["g", "t"])
    row = common_prefix(df, "g", "t").collect()[0]
    want = os.path.commonprefix(texts)
    assert row["prefix"] == want and row["prefix_len"] == len(want)
