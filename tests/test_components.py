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
    """With the star fallback disabled, a path graph longer than
    max_iter rounds must raise, never return a silently split
    labeling."""
    path = _edges(spark, [(i, i + 1) for i in range(6)])
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(path, max_iter=2, star_fallback=False)


def test_budget_overrun_falls_back_to_star(spark):
    """Default behavior on a planted chain that exceeds the propagation
    budget: the call silently completes via star contraction with the
    exact same labeling the converged propagation would produce."""
    chain = [(i, i + 1) for i in range(60)]
    comp = connected_components(_edges(spark, chain), max_iter=3)
    assert comp.columns == ["id", "comp"]
    rows = {r["id"]: r["comp"] for r in comp.collect()}
    assert rows == {i: 0 for i in range(61)}


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


# ---------------------------------------------------------------------------
# large-star/small-star (SOCC'14) — the O(log n) long-diameter escape
# ---------------------------------------------------------------------------


def _star_labels(spark, edges):
    from nahuatl_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components_star(df).collect()
    }


def _plain_labels(spark, edges, max_iter=15, star_fallback=True):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["comp"]
        for r in connected_components(
            df, max_iter=max_iter, star_fallback=star_fallback
        ).collect()
    }


def test_star_matches_plain_on_mixed_graph(spark):
    edges = (
        [(1, 2), (2, 3), (3, 1)]          # triangle
        + [(10, 11), (11, 12)]            # path
        + [(20, 21)]                      # pair
        + [(30, 31), (31, 32), (32, 33), (30, 33), (31, 33)]  # dense
        + [(40, 41), (41, 40), (40, 41)]  # dup / reversed edges
    )
    assert _star_labels(spark, edges) == _plain_labels(spark, edges)


def test_star_handles_long_chain_plain_cannot(spark):
    """A 120-node path has diameter 119: plain propagation would need
    ~120 rounds (it raises at max_iter=15); star contraction converges
    in O(log n) rounds and labels the whole chain with its min id."""
    import pytest

    chain = [(i, i + 1) for i in range(120)]
    with pytest.raises(ValueError, match="did not converge"):
        _plain_labels(spark, chain, max_iter=5, star_fallback=False)
    labels = _star_labels(spark, chain)
    assert set(labels) == set(range(121))
    assert set(labels.values()) == {0}


def test_star_max_iter_is_a_hard_cap(spark):
    """Odd max_iter must run exactly max_iter rounds, never max_iter+1
    (r13 verdict: the two-rounds-per-materialization loop could
    overshoot an odd cap by one round). A 300-node path cannot converge
    in one round, so max_iter=1 must raise rather than sneak in a
    second round; a sufficient odd cap still converges to the same
    labels as the default."""
    import pytest

    from nahuatl_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(ValueError, match="did not converge"):
        connected_components_star(df, max_iter=1)
    labels = _star_labels(spark, chain)
    assert set(labels.values()) == {0}


def test_star_empty_and_self_loops(spark):
    assert _star_labels(spark, [(7, 7)]) == {}
    from nahuatl_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(empty).count() == 0
