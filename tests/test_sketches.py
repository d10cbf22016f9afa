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
