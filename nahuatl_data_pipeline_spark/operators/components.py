"""Connected components over near-duplicate pair graphs.

The missing last step of fuzzy dedup: pairwise similarity (q25/q38/q39)
yields EDGES, but "keep one copy per duplicate cluster" needs the
transitive closure — A~B and B~C must land in one cluster even though
(A, C) was never scored (their similarity can sit below threshold). The
reference stops at pairwise removal (SparkDedup.scala:120-160 drops the
right-hand side of each pair), which silently over- or under-deletes on
chains; component labeling is the principled replacement.

Algorithm: iterative min-label propagation expressed as DataFrame ops —
each round every vertex takes the minimum component label among itself
and its neighbors (join + groupBy.min, both shuffles on the vertex id,
map-side partial agg applies). Converges in O(diameter) rounds;
near-dup clusters are near-cliques with tiny diameters, so 2-4 rounds
is typical (``max_iter`` guards pathological chains). Lineage is
truncated every round with ``localCheckpoint`` — without it the
iterative plan nests one join-aggregate layer per round and analysis
time explodes. For graphs with genuinely large diameters switch to the
large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14), which converges in
O(log n) rounds at the cost of a more complex per-round plan.

Fully deterministic: labels are vertex-id minima, independent of
partitioning and iteration interleave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Label each vertex of an undirected edge list with the minimum
    vertex id reachable from it.

    Returns ``(id, component)`` for every vertex that appears in at
    least one edge (isolated rows never entered the pair graph and need
    no cluster label). ``component`` equals the smallest id in the
    cluster, so ``component == id`` marks a deterministic canonical
    representative.

    Raises ``ValueError`` if labels are still changing after
    ``max_iter`` rounds — a truncated labeling would silently split
    clusters, which for dedup means shipping duplicates.
    """
    sym = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    # Materialize the symmetrized edge list ONCE: every round's join
    # re-reads it, and without this checkpoint each round would re-run
    # the entire upstream pair computation (a banded-Jaccard query at
    # corpus scale) — the sf1 self-run measured q58 at 72 s from exactly
    # that recompute, vs the edges-once cost plus cheap rounds after.
    sym = (
        sym.unionByName(sym.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prop = sym.join(
            labels.withColumnRenamed("id", "s"), "s"
        ).select(F.col("d").alias("id"), "comp")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise ValueError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the graph has a longer path than expected — raise max_iter"
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → per-document cluster labels + canonical flag.

    ``(doc_id, component, is_canonical)``: one row per document involved
    in any near-dup pair; keep ``is_canonical`` rows (plus all documents
    absent from ``pairs``) to deduplicate a corpus cluster-wise.
    """
    comp = connected_components(pairs, src=id_a, dst=id_b)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("comp") == F.col("id")).alias("is_canonical"),
    )
