"""Split-operator tests (mirrors reference split invariants,
``test_parity_with_legacy.py:278-345``: exact ratios, zero leakage,
reproducibility)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.split import (
    hash_split,
    seeded_split,
    split_leakage_count,
)


def ids(spark, n=1000):
    return spark.range(n).withColumnRenamed("id", "key").withColumn(
        "stratum", (F.col("key") % 4).cast("string")
    )


def test_exact_counts(spark):
    df = seeded_split(ids(spark), "key", seed=42)
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == {"train": 900, "validation": 50, "test": 50}


def test_disjoint_and_total(spark):
    df = seeded_split(ids(spark), "key", seed=42).cache()
    train = df.filter(F.col("split") == "train")
    val = df.filter(F.col("split") == "validation")
    test = df.filter(F.col("split") == "test")
    assert split_leakage_count(train, val, ["key"]) == 0
    assert split_leakage_count(train, test, ["key"]) == 0
    assert split_leakage_count(val, test, ["key"]) == 0
    assert train.count() + val.count() + test.count() == 1000


def test_reproducible_and_partition_invariant(spark):
    base = ids(spark)
    a = {r["key"]: r["split"] for r in seeded_split(base, "key", seed=42).collect()}
    b = {
        r["key"]: r["split"]
        for r in seeded_split(base.repartition(17), "key", seed=42).collect()
    }
    assert a == b


def test_seed_changes_assignment(spark):
    a = {r["key"]: r["split"] for r in seeded_split(ids(spark), "key", seed=1).collect()}
    b = {r["key"]: r["split"] for r in seeded_split(ids(spark), "key", seed=2).collect()}
    assert a != b


def test_stratified_exact_per_stratum(spark):
    df = seeded_split(ids(spark), "key", seed=42, stratify_by="stratum")
    counts = (
        df.groupBy("stratum", "split").agg(F.count("*").alias("n")).collect()
    )
    by = {(r["stratum"], r["split"]): r["n"] for r in counts}
    for s in "0123":
        assert by[(s, "train")] == 225
        assert by[(s, "validation")] == 12  # floor(250*.95)-floor(250*.9)=12
        assert by[(s, "test")] == 13


def test_custom_ratios_validation():
    import pytest

    with pytest.raises(ValueError):
        seeded_split(None, "key", ratios={"a": 0.5, "b": 0.6})


def test_hash_split_approximate_and_stable(spark):
    df = hash_split(ids(spark, 5000), "key", seed=42).cache()
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] - 4500) < 150  # approximate, law of large numbers
    again = {r["key"]: r["split"] for r in hash_split(ids(spark, 5000), "key", seed=42).collect()}
    first = {r["key"]: r["split"] for r in df.collect()}
    assert first == again
