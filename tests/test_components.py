"""Connected-components clustering over near-dup pair graphs."""

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.components import (
    connected_components,
    duplicate_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_chain_bridges_into_one_component(spark):
    """A-B, B-C, C-D with no direct A-C/A-D/B-D edges: transitivity must
    still put all four in component A — the case pairwise dedup gets
    wrong."""
    comp = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4)]))
    rows = {r["id"]: r["comp"] for r in comp.collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_cliques_stay_separate(spark):
    comp = connected_components(
        _edges(spark, [(1, 2), (2, 1), (10, 11), (11, 12), (10, 12)])
    )
    rows = {r["id"]: r["comp"] for r in comp.collect()}
    assert rows == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_empty_edges_empty_result(spark):
    comp = connected_components(_edges(spark, []))
    assert comp.count() == 0
    assert comp.columns == ["id", "comp"]


def test_partition_independence(spark):
    e = _edges(spark, [(5, 3), (3, 9), (9, 7), (20, 21)])
    a = sorted(map(tuple, connected_components(e).collect()))
    b = sorted(map(tuple, connected_components(e.repartition(7)).collect()))
    assert a == b == [(3, 3), (5, 3), (7, 3), (9, 3), (20, 20), (21, 20)]


def test_nonconvergence_raises_not_truncates(spark):
    """A path graph longer than max_iter rounds must raise, never return
    a silently split labeling."""
    path = _edges(spark, [(i, i + 1) for i in range(6)])
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(path, max_iter=2)


def test_duplicate_clusters_canonical_flag(spark):
    out = duplicate_clusters(_edges(spark, [(4, 2), (2, 8)]))
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(2, 2, True), (4, 2, False), (8, 2, False)]


def test_duplicate_clusters_keep_rule(spark):
    """Canonical rows + untouched docs = deduplicated corpus with exactly
    one survivor per cluster."""
    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    clusters = duplicate_clusters(_edges(spark, [(1, 2), (2, 3), (7, 8)]))
    keep = docs.join(
        clusters.filter(~F.col("is_canonical")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    assert sorted(r["doc_id"] for r in keep.collect()) == [0, 1, 4, 5, 6, 7, 9]
