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


def test_matches_global_md5_sort_semantics(spark):
    """The distributed bucketed rank must equal the plain global
    ``row_number() OVER (ORDER BY md5(seed:key), key)`` semantics the
    oracle SQL uses — verified against a driver-side md5 sort."""
    import hashlib

    keys = [f"k{i:04d}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r["key"]: r["split"] for r in seeded_split(df, "key", seed=7).collect()}
    order = sorted(keys, key=lambda k: (hashlib.md5(f"7:{k}".encode()).hexdigest(), k))
    expected = {}
    for rank, k in enumerate(order, start=1):
        if rank <= int(200 * 0.9):
            expected[k] = "train"
        elif rank <= int(200 * 0.95):
            expected[k] = "validation"
        else:
            expected[k] = "test"
    assert got == expected


def test_split_rank_is_distributed(spark):
    """Regression for the round-1 scale-killer: the old implementation's
    global ``Window.orderBy`` funneled every row through ONE task, leaving
    the output in a single partition. The bucketed rank must not."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # else AQE coalesces tiny shuffles to 1
    try:
        out = seeded_split(ids(spark, 2000).repartition(8), "key", seed=42)
        assert out.rdd.getNumPartitions() > 1
        # the row_number window over the full input is partitioned by bucket
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "row_number()" in plan and "windowspecdefinition(__split_b" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_null_stratum_rows_survive(spark):
    df = spark.createDataFrame(
        [(str(i), None if i % 3 == 0 else "s") for i in range(60)],
        "key string, stratum string",
    )
    out = seeded_split(df, "key", seed=42, stratify_by="stratum")
    assert out.count() == 60
    per = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert per[None] == 20 and per["s"] == 40


def test_hash_split_approximate_and_stable(spark):
    df = hash_split(ids(spark, 5000), "key", seed=42).cache()
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] - 4500) < 150  # approximate, law of large numbers
    again = {r["key"]: r["split"] for r in hash_split(ids(spark, 5000), "key", seed=42).collect()}
    first = {r["key"]: r["split"] for r in df.collect()}
    assert first == again


def test_hash_split_validates_ratios(spark):
    import pytest

    from nahuatl_data_pipeline_spark.operators.split import hash_split

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(spark.range(10), "id", {"train": 0.8, "test": 0.05})


def test_seeded_split_null_key_assigned_like_empty(spark):
    """Null keys must hash identically in Spark and any SQL oracle
    (concat + coalesce, not null-skipping concat_ws): a null-key row gets
    the same assignment as an empty-string key."""
    from nahuatl_data_pipeline_spark.operators.split import seeded_split

    df = spark.createDataFrame([(None,), ("",), ("a",), ("b",)], "k string")
    out = {r["k"]: r["split"] for r in seeded_split(df, "k").collect()}
    assert len(out) == 4 and all(v in ("train", "validation", "test")
                                 for v in out.values())
    assert out[None] == out[""]  # same md5("42:") bucket on both engines


# ---------------------------------------------------------------------------
# grouped_kfold
# ---------------------------------------------------------------------------


def test_grouped_kfold_no_group_straddles_folds(spark):
    from nahuatl_data_pipeline_spark.operators.split import grouped_kfold

    rows = [(i, f"g{i % 17}") for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = grouped_kfold(df, "grp", k=4)
    from pyspark.sql import functions as F

    per_group = (
        out.groupBy("grp").agg(F.countDistinct("fold").alias("nf")).collect()
    )
    assert all(r["nf"] == 1 for r in per_group)
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds <= set(range(4)) and len(folds) > 1


def test_grouped_kfold_deterministic_and_null_safe(spark):
    from nahuatl_data_pipeline_spark.operators.split import grouped_kfold

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id: bigint, grp: string"
    )
    a = {r["id"]: r["fold"] for r in grouped_kfold(df, "grp", k=3).collect()}
    b = {r["id"]: r["fold"] for r in grouped_kfold(df, "grp", k=3).collect()}
    assert a == b
    assert a[2] == a[3]  # both NULL groups share one fold


def test_grouped_kfold_rejects_k_below_two(spark):
    import pytest

    from nahuatl_data_pipeline_spark.operators.split import grouped_kfold

    df = spark.createDataFrame([(1, "a")], ["id", "grp"])
    with pytest.raises(ValueError):
        grouped_kfold(df, "grp", k=1)
