"""Dataset card: scalar stats, source mix, duplication rate."""

from nahuatl_data_pipeline_spark.plans.report import dataset_report


def test_dataset_report_small_corpus(spark):
    rows = [
        (1, "alpha beta gamma", "web"),
        (2, "alpha beta gamma", "web"),      # exact dup of 1
        (3, "delta epsilon", "web"),
        (4, "zeta eta theta iota", "books"),
        (5, None, "books"),                  # null text
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rep = dataset_report(spark, docs, top_sources=1)

    assert rep["n_docs"] == 5
    assert rep["n_sources"] == 2
    assert rep["null_text_docs"] == 1
    assert rep["total_tokens"] == 3 + 3 + 2 + 4
    # 4 non-null texts, 3 distinct -> dup rate 0.25
    assert rep["exact_dup_rate"] == 0.25
    mix = rep["source_mix"]
    assert mix[0]["source"] == "web" and mix[0]["n_docs"] == 3
    assert mix[1]["source"] == "OTHER" and mix[1]["n_docs"] == 2
    assert abs(sum(m["share"] for m in mix) - 1.0) < 1e-9
    assert 0 < rep["source_hhi"] <= 1
    assert rep["source_entropy"] > 0


def test_dataset_report_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    rep = dataset_report(spark, docs)
    assert rep["n_docs"] == 0 and rep["exact_dup_rate"] == 0.0
    assert rep["source_mix"] == []
