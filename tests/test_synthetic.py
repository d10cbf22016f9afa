"""M6 synthetic generation: deterministic template expansion, volume
multiplier, and a sane (seed-coalesced) plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.synthetic import (
    SEED_DATA,
    generate_synthetic_corpus,
)


def test_expansion_shape_and_categories(spark):
    df = generate_synthetic_corpus(spark)
    rows = df.collect()
    base = sum(
        len(v) for k, v in SEED_DATA.items()
        if k not in ("time_words", "locations")
    )
    expected = (
        base
        + len(SEED_DATA["numbers"]) * len(SEED_DATA["animals"])  # counting
        + len(SEED_DATA["family"]) * 2                            # Mi/Tu
        + len(SEED_DATA["verbs_present"]) * len(SEED_DATA["time_words"])
        + len(SEED_DATA["locations"])                             # Estoy …
    )
    assert len(rows) == expected
    cats = {r["category"] for r in rows}
    assert {"numbers", "possessives", "time", "prepositions"} <= cats
    by_cat = {(r["es"], r["nah"]) for r in rows}
    assert ("dos jaguar", "ome ocelotl") in by_cat          # counting compound
    assert ("Mi madre", "Nonantli") in by_cat               # possessive prefix
    assert ("Estoy en la casa", "Nica calli") in by_cat     # location template


def test_multiplier_scales_rows_deterministically(spark):
    one = generate_synthetic_corpus(spark, multiplier=1)
    three = generate_synthetic_corpus(spark, multiplier=3)
    n = one.count()
    assert three.count() == 3 * n
    # variant 0 replica is byte-identical to the unmultiplied corpus
    base_rows = sorted(map(tuple, one.collect()))
    v0 = sorted(
        map(tuple, three.filter(~F.col("es").rlike(r"\(v \d+ \)$")).collect())
    )
    assert v0 == base_rows
    # and replicas stay distinct (no accidental dedup target)
    assert three.distinct().count() == 3 * n


def test_plan_has_no_thousand_task_seed_scan(spark):
    """Seed frames must be Arrow-local (LocalTableScan), not Python-RDD
    scans: the list-backed path slices defaultParallelism partitions PER
    seed frame and cross-multiplies them (observed: 3296 tasks and ~8 s
    for 73 rows)."""
    df = generate_synthetic_corpus(spark)
    assert df.rdd.getNumPartitions() <= 64
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
