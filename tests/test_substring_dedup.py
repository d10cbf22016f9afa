"""Exact substring-span dedup: hand-verifiable span semantics."""

from nahuatl_data_pipeline_spark.operators.substring_dedup import (
    exact_substring_dedup,
)


def _run(spark, rows, n=3):
    df = spark.createDataFrame(rows, ["id", "text"])
    return {
        r["id"]: r
        for r in exact_substring_dedup(df, "id", "text", n=n).collect()
    }


def test_identical_docs_second_loses_all_tokens(spark):
    text = "a b c d e f"
    out = _run(spark, [(1, text), (2, text)], n=3)
    assert out[1]["n_removed"] == 0 and out[1]["cleaned"] == text
    assert out[2]["n_removed"] == 6 and out[2]["cleaned"] == ""


def test_shared_boilerplate_removed_from_later_doc_only(spark):
    out = _run(
        spark,
        [
            (1, "copyright notice here alpha beta"),
            (2, "copyright notice here gamma delta"),
        ],
        n=3,
    )
    assert out[1]["n_removed"] == 0
    # doc 2 loses exactly the 3-token repeated prefix
    assert out[2]["n_removed"] == 3
    assert out[2]["cleaned"] == "gamma delta"


def test_short_docs_and_unique_docs_untouched(spark):
    out = _run(spark, [(1, "x y"), (2, "p q r s"), (3, None)], n=3)
    assert out[1]["n_removed"] == 0 and out[1]["cleaned"] == "x y"
    assert out[2]["n_removed"] == 0
    assert 3 not in out  # null text carries no tokens


def test_overlapping_spans_merge_via_range_frame(spark):
    # doc 2 repeats a 4-token passage: two overlapping dup 3-shingles
    # cover 4 tokens total, not 6
    out = _run(
        spark,
        [(1, "w1 w2 w3 w4 tail1"), (2, "w1 w2 w3 w4 tail2")],
        n=3,
    )
    assert out[2]["n_removed"] == 4
    assert out[2]["cleaned"] == "tail2"


def test_within_doc_repetition_also_dedups(spark):
    # the same 3-gram twice INSIDE one doc: second occurrence removed
    out = _run(spark, [(1, "a b c x a b c")], n=3)
    assert out[1]["n_removed"] == 3
    assert out[1]["cleaned"] == "a b c x"


def test_rejects_n_below_two(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b")], ["id", "text"])
    with pytest.raises(ValueError):
        exact_substring_dedup(df, "id", "text", n=1)
