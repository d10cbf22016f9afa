"""Corpus-wide sentence/line dedup (C4 / RefinedWeb boilerplate removal)."""

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.line_dedup import dedup_lines


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_boilerplate_kept_once(spark):
    df = _df(
        spark,
        [
            (1, "Unique alpha statement. Subscribe to our newsletter."),
            (2, "Unique beta statement. Subscribe to our newsletter."),
            (3, "Unique gamma statement. Subscribe to our newsletter."),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["text_clean"] == (
        "Unique alpha statement. Subscribe to our newsletter."
    )
    assert out[2]["text_clean"] == "Unique beta statement."
    assert out[3]["text_clean"] == "Unique gamma statement."
    assert [out[i]["n_kept"] for i in (1, 2, 3)] == [2, 1, 1]
    assert [out[i]["n_total"] for i in (1, 2, 3)] == [2, 2, 2]


def test_within_doc_repeat_kept_once_order_preserved(spark):
    df = _df(spark, [(1, "First point. Second point. First point. Third point.")])
    (row,) = dedup_lines(df).collect()
    assert row["text_clean"] == "First point. Second point. Third point."
    assert row["n_kept"] == 3 and row["n_total"] == 4


def test_case_insensitive_key(spark):
    df = _df(spark, [(1, "Hello world."), (2, "HELLO WORLD.")])
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["n_kept"] == 1
    assert out[2]["n_kept"] == 0 and out[2]["text_clean"] == ""


def test_null_and_empty_docs_stay_visible(spark):
    df = _df(spark, [(1, None), (2, ""), (3, "Real text here.")])
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert len(out) == 3
    assert out[1]["text_clean"] == "" and out[1]["n_total"] == 0
    assert out[2]["text_clean"] == "" and out[2]["n_total"] == 0
    assert out[3]["n_kept"] == 1


def test_min_kept_drops_hollowed_docs(spark):
    df = _df(
        spark,
        [
            (1, "Shared line one. Shared line two."),
            (2, "Shared line one. Shared line two."),  # fully deduped away
        ],
    )
    out = dedup_lines(df, min_kept=1)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_partition_independence(spark):
    rows = [(i, f"Common lead-in sentence. Unique tail {i}.") for i in range(30)]
    df = _df(spark, rows)
    a = sorted(
        (r["doc_id"], r["text_clean"])
        for r in dedup_lines(df.repartition(1)).collect()
    )
    b = sorted(
        (r["doc_id"], r["text_clean"])
        for r in dedup_lines(df.repartition(7)).collect()
    )
    assert a == b
    # exactly one doc keeps the shared sentence, and it is the smallest id
    keepers = [d for d, t in a if "Common lead-in sentence." in t]
    assert keepers == [0]
