"""F13/F14 unit tests: sentence segmentation + greedy chunk packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.segmentation import (
    chunk_documents,
    sentences,
    split_sentences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sentences_basic(spark):
    df = _docs(spark, [(1, "Hola mundo. ¿Cómo estás? Bien!")])
    out = df.select(sentences("text").alias("s")).collect()[0]["s"]
    assert out == ["Hola mundo.", "¿Cómo estás?", "Bien!"]


def test_sentences_no_terminator(spark):
    df = _docs(spark, [(1, "sin puntuacion final")])
    out = df.select(sentences("text").alias("s")).collect()[0]["s"]
    assert out == ["sin puntuacion final"]


def test_split_sentences_positions(spark):
    df = _docs(spark, [(7, "a. b. c.")])
    rows = split_sentences(df, "doc_id", "text").orderBy("sent_id").collect()
    assert [(r["doc_id"], r["sent_id"], r["sentence"]) for r in rows] == [
        (7, 0, "a."),
        (7, 1, "b."),
        (7, 2, "c."),
    ]


def test_chunks_respect_max_chars(spark):
    text = " ".join(f"sentence number {i}." for i in range(30))
    df = _docs(spark, [(1, text)])
    rows = chunk_documents(df, "doc_id", "text", max_chars=60).collect()
    assert len(rows) > 1
    for r in rows:
        assert r["chunk_n_chars"] <= 60


def test_chunks_preserve_all_text(spark):
    text = "one two. three four! five six? seven."
    df = _docs(spark, [(1, text)])
    rows = (
        chunk_documents(df, "doc_id", "text", max_chars=15)
        .orderBy("chunk_id")
        .collect()
    )
    rejoined = " ".join(r["chunk"] for r in rows)
    assert rejoined == text


def test_oversized_sentence_is_own_chunk(spark):
    long_sentence = "x" * 100 + "."
    df = _docs(spark, [(1, f"short. {long_sentence} tail.")])
    chunks = [
        r["chunk"]
        for r in chunk_documents(df, "doc_id", "text", max_chars=20)
        .orderBy("chunk_id")
        .collect()
    ]
    assert long_sentence in chunks


def test_null_text_yields_one_null_chunk_row(spark):
    """Outer explode: a null-text doc keeps ONE row (null chunk) so ids
    never silently vanish; it contributes no actual chunk content."""
    df = _docs(spark, [(1, None), (2, "ok.")])
    out = {r["doc_id"]: r["chunk"] for r in
           chunk_documents(df, "doc_id", "text", max_chars=50).collect()}
    assert out == {1: None, 2: "ok."}


def test_null_and_empty_docs_survive_sentence_split(spark):
    from nahuatl_data_pipeline_spark.functions.segmentation import (
        chunk_documents,
        split_sentences,
    )

    df = spark.createDataFrame(
        [(1, "Una frase. Otra frase."), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    sent = split_sentences(df, "doc_id", "text")
    assert sorted({r["doc_id"] for r in sent.collect()}) == [1, 2, 3]
    assert sent.filter("doc_id = 2").collect()[0]["sentence"] is None
    ch = chunk_documents(df, "doc_id", "text")
    assert sorted({r["doc_id"] for r in ch.collect()}) == [1, 2, 3]
