"""Sketch-family invariants: HLL cardinality and quantile sketches are
estimates, so no cross-engine oracle — instead the error bound vs the
exact computation is the contract."""

import duckdb

from nahuatl_data_pipeline_spark import registry
from tests.conftest import SF_ORACLE


def test_hll_within_2pct_of_exact(spark):
    out = {
        r["lang"]: r
        for r in registry.queries()["q63_hll_cardinality"](spark, SF_ORACLE).collect()
    }
    exact = duckdb.sql(
        f"""
        SELECT lang, COUNT(DISTINCT t) AS n
        FROM (
          SELECT lang, UNNEST(LIST_FILTER(
            REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'), x -> x <> '')) AS t
          FROM read_parquet('{SF_ORACLE}/documents.parquet')
        ) GROUP BY lang
        """
    ).df()
    assert len(out) == len(exact)
    for _, row in exact.iterrows():
        approx = out[row["lang"]]["approx_types"]
        # rsd=0.02 => keep a 5% belt-and-braces bound
        assert abs(approx - row["n"]) <= max(1, 0.05 * row["n"]), (
            row["lang"], approx, row["n"]
        )


def test_quantile_sketch_within_rank_error(spark):
    out = {
        r["lang"]: [r["p25"], r["p50"], r["p90"]]
        for r in registry.queries()["q64_quantile_sketch"](spark, SF_ORACLE).collect()
    }
    exact = duckdb.sql(
        f"""
        SELECT lang,
               QUANTILE_DISC(LENGTH(text), [0.25, 0.5, 0.9]) AS qs,
               COUNT(*) AS n
        FROM read_parquet('{SF_ORACLE}/documents.parquet')
        GROUP BY lang
        """
    ).df()
    for _, row in exact.iterrows():
        got = out[row["lang"]]
        # accuracy=10000 => rank error 1e-4; on groups of ~100 docs the
        # sketch must be exact to within one discrete value step
        for approx, ex in zip(got, row["qs"]):
            assert abs(approx - ex) <= max(2, 0.02 * ex), (row["lang"], got, row["qs"])


# ---------------------------------------------------------------------------
# Portable Count-Min sketch (operators/sketches.py)
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [(f"k{i % 50}",) for i in range(5000)], ["k"]
    )
    sketch = cms_build(df, "k", width=1024, depth=3)
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["cms_estimate"]
        for r in cms_estimate(sketch, keys, "k", width=1024, depth=3).collect()
    }
    # true count is exactly 100 per key; 50 keys in 1024 buckets → with
    # depth 3 the min row is collision-free and the estimate exact
    assert all(v >= 100 for v in est.values())  # one-sided error
    assert all(v == 100 for v in est.values())  # sparse → tight


def test_cms_streaming_and_preaggregated_builds_identical(spark):
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.operators.sketches import cms_build

    df = spark.createDataFrame(
        [(f"t{i % 17}",) for i in range(300)], ["k"]
    )
    stream = cms_build(df, "k", width=64, depth=2)
    pre = cms_build(
        df.groupBy("k").agg(F.count(F.lit(1)).alias("n")),
        "k",
        width=64,
        depth=2,
        count_col="n",
    )
    assert sorted(map(tuple, stream.collect())) == sorted(
        map(tuple, pre.collect())
    )


def test_cms_unseen_key_reads_zero_or_collision(spark):
    from nahuatl_data_pipeline_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    sketch = cms_build(df, "k", width=1024, depth=3)
    probe = spark.createDataFrame([("never-seen",)], ["k"])
    got = cms_estimate(sketch, probe, "k", width=1024, depth=3).collect()
    # 3 keys in 3×1024 cells: the unseen key's min row is empty → 0
    assert got[0]["cms_estimate"] == 0


# ---------------------------------------------------------------------------
# Bloom semi-join prefilter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.operators.sketches import (
        bloom_positions,
        bloom_prefilter,
    )

    keys = spark.range(200).withColumnRenamed("id", "k")  # members 0..199
    probes = spark.range(5000).withColumnRenamed("id", "k")
    pos = bloom_positions(keys, "k", width=4096, depth=3)
    passed = {r["k"] for r in bloom_prefilter(
        probes, "k", pos, width=4096, depth=3).collect()}
    assert set(range(200)) <= passed  # every true member survives
    fp = len(passed) - 200
    # fill ≈ 200/4096 per row; fpr ≈ 0.049³ ≈ 1e-4 → expect ≈ 0.5 FPs
    assert fp <= 20


def test_bloom_prefilter_plan_never_shuffles_facts(spark):
    from nahuatl_data_pipeline_spark.operators.sketches import (
        bloom_positions,
        bloom_prefilter,
    )

    keys = spark.range(50).withColumnRenamed("id", "k")
    probes = spark.range(1000).withColumnRenamed("id", "k")
    pos = bloom_positions(keys, "k", width=1024, depth=3)
    plan = (
        bloom_prefilter(probes, "k", pos, width=1024, depth=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the probe side rides three broadcast semi-joins — no exchange of
    # the fact stream (only the tiny position table broadcasts)
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 0


# ---------------------------------------------------------------------------
# minwise sketch (cardinality / Jaccard overlap)
# ---------------------------------------------------------------------------


def _mk_docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["k"])


def test_minwise_sketch_shape_and_duplicate_invariance(spark):
    from nahuatl_data_pipeline_spark.operators.sketches import minwise_sketch

    base = _mk_docs(spark, range(100))
    sk = minwise_sketch(base, "k", k=16).collect()
    assert sorted(r["i"] for r in sk) == list(range(16))
    # MIN over a multiset == MIN over its support: duplicating every
    # row must not move a single cell
    doubled = base.union(base)
    sk2 = minwise_sketch(doubled, "k", k=16).collect()
    assert {r["i"]: r["h"] for r in sk} == {r["i"]: r["h"] for r in sk2}


def test_minwise_sketch_merges_by_cellwise_min(spark):
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.operators.sketches import minwise_sketch

    left = _mk_docs(spark, range(0, 60))
    right = _mk_docs(spark, range(40, 120))
    whole = minwise_sketch(left.union(right), "k", k=16)
    merged = (
        minwise_sketch(left, "k", k=16)
        .withColumnRenamed("h", "hl")
        .join(minwise_sketch(right, "k", k=16), "i")
        .select("i", F.least("hl", "h").alias("h"))
    )
    assert {(r["i"], r["h"]) for r in whole.collect()} == {
        (r["i"], r["h"]) for r in merged.collect()
    }


def test_minwise_sketch_excludes_nulls_and_handles_empty(spark):
    from nahuatl_data_pipeline_spark.operators.sketches import minwise_sketch

    with_null = spark.createDataFrame([(1,), (None,)], "k: bigint")
    only_one = spark.createDataFrame([(1,)], "k: bigint")
    assert (
        minwise_sketch(with_null, "k", k=8).collect()
        == minwise_sketch(only_one, "k", k=8).collect()
    )
    empty = only_one.where("k IS NULL")
    rows = minwise_sketch(empty, "k", k=8).collect()
    assert len(rows) == 8 and all(r["h"] is None for r in rows)


def test_minwise_overlap_identity_and_disjoint(spark):
    from nahuatl_data_pipeline_spark.operators.sketches import (
        minwise_overlap,
        minwise_sketch,
    )

    a = minwise_sketch(_mk_docs(spark, range(500)), "k", k=64)
    b = minwise_sketch(_mk_docs(spark, range(500, 1000)), "k", k=64)
    same = minwise_overlap(a, a, k=64).collect()[0]
    assert same["est_jaccard"] == 1.0
    assert same["est_intersect"] == same["est_union"] == same["est_a"]
    disj = minwise_overlap(a, b, k=64).collect()[0]
    assert disj["est_jaccard"] <= 0.1  # k=64 match-rate noise floor


def test_minwise_cardinality_estimate_in_bounds(spark):
    from nahuatl_data_pipeline_spark.operators.sketches import (
        minwise_overlap,
        minwise_sketch,
    )

    n = 2000
    sk = minwise_sketch(_mk_docs(spark, range(n)), "k", k=64)
    est = minwise_overlap(sk, sk, k=64).collect()[0]["est_a"]
    # k=64 harmonic estimator: ~1/sqrt(k) relative error; 40% belt
    assert 0.6 * n <= est <= 1.4 * n, est


def test_minwise_exact_audit_rides_the_same_aggregate(spark):
    from nahuatl_data_pipeline_spark.operators.sketches import minwise_sketch

    df = _mk_docs(spark, [1, 1, 2, 3, 3, 3])
    rows = minwise_sketch(df, "k", k=4, exact=True).collect()
    assert all(r["n_exact"] == 3 for r in rows)


def test_portable_hll_estimate_within_rsd_of_exact_and_builtin(spark):
    """The q167 grid's derived estimate lands within HLL error bounds of
    the exact distinct count AND agrees with the built-in
    approx_count_distinct (q63) — the two estimates bracket the same
    truth. p=9 → rsd ≈ 4.6%; 4×rsd belt-and-braces (deterministic data,
    so the margin is reproducible, not flaky)."""
    from nahuatl_data_pipeline_spark.operators.sketches import hll_estimate

    grid = registry.queries()["q167_hll_portable"](spark, SF_ORACLE)
    est = {
        r["lang"]: r["hll_estimate"]
        for r in hll_estimate(grid, p=9, group_cols=("lang",)).collect()
    }
    builtin = {
        r["lang"]: r["approx_types"]
        for r in registry.queries()["q63_hll_cardinality"](
            spark, SF_ORACLE
        ).collect()
    }
    exact = duckdb.sql(
        f"""
        SELECT lang, COUNT(DISTINCT t) AS n
        FROM (
          SELECT lang, UNNEST(LIST_FILTER(
            REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'), x -> x <> '')) AS t
          FROM read_parquet('{SF_ORACLE}/documents.parquet')
        ) GROUP BY lang
        """
    ).df()
    assert len(est) == len(exact)
    for _, row in exact.iterrows():
        lang, n = row["lang"], row["n"]
        assert abs(est[lang] - n) <= max(2, 4 * 0.046 * n), (lang, est[lang], n)
        # portable vs built-in: both inside their bounds around n
        assert abs(est[lang] - builtin[lang]) <= max(
            2, (4 * 0.046 + 0.05) * n
        ), (lang, est[lang], builtin[lang])


def test_portable_hll_merges_by_cellwise_max(spark):
    """Grids of disjoint corpus halves merged by cell-wise MAX equal the
    grid of the union bit-for-bit — the mergeability that makes the
    portable HLL a 100 TB primitive (and the exact analogue of the CMS
    sum-merge / minwise min-merge invariants)."""
    from pyspark.sql import functions as F

    from nahuatl_data_pipeline_spark.operators.sketches import hll_registers

    df = spark.createDataFrame(
        [(i, f"tok{i % 97}") for i in range(400)], "i long, k string"
    )
    whole = hll_registers(df, "k", p=5).collect()
    a = hll_registers(df.filter(F.col("i") % 2 == 0), "k", p=5)
    b = hll_registers(df.filter(F.col("i") % 2 == 1), "k", p=5)
    merged = (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    )
    as_map = lambda rows: {r["register"]: r["max_rho"] for r in rows}
    assert as_map(whole) == as_map(merged)


def test_portable_hll_duplicate_invariance_and_null_exclusion(spark):
    from nahuatl_data_pipeline_spark.operators.sketches import hll_registers

    base = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "k string"
    )
    dup = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",), (None,)], "k string"
    )
    as_map = lambda df: {
        r["register"]: r["max_rho"] for r in df.collect()
    }
    assert as_map(hll_registers(base, "k", p=6)) == as_map(
        hll_registers(dup, "k", p=6)
    )
