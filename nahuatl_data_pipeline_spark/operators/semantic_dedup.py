"""Semantic deduplication over an embedding column — the SemDeDup idea
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — public method; beyond-reference scale
operator): partition the embedding space into cells, pick one
representative per cell, and drop every other member whose cosine to
the representative clears a threshold.

Where the paper clusters with k-means, this operator cells with
DETERMINISTIC sign random projections (SRP / hyperplane LSH, Charikar
2002): bit_j = sign(<v, r_j>) with the hyperplane entries r_j[d] ∈ {±1}
derived from md5(j ":" d) — the repo's engine-portable hash
(``functions.hashing.hash64`` formula), so the SAME cell ids are
computable in any SQL engine and the whole operator is oracle-checkable
end to end. The k-means flavour exists in the engine too
(``similarity.ivf_topk``'s seeded spherical k-means); SRP cells are the
oracle-grade, shuffle-friendly default.

Scale shape (the point): celling is a PROJECTION — one expression per
row, zero shuffles. The only corpus-sized shuffles are one groupBy
(min id per cell) and one keyed join back on the cell id; the
member-vs-representative scoring is |members| cosines, NOT the
|members|² intra-cell pairwise matrix, so cell skew never goes
quadratic. At 100 TB, raise ``n_bits`` so cells stay small (2^20 cells
for ~1e9 docs ≈ 1k docs/cell); representatives are one row per
non-empty cell, so the join stays a plain key-partitioned hash join at
any scale (no broadcast assumption). The full pairwise-within-cell
variant, when recall demands it, is the existing q25/q39 pair machinery
run per-cell.

Float determinism: the projection dot product is an ORDERED left fold
(``similarity._dot``), and the sign test only flips if |<v, r_j>| is
within float-noise of 0 — for real-valued embeddings that is
measure-zero and asserted away in tests (min |dp| at the test SFs is
orders of magnitude above 1e-9). Cosines are rounded to ``round_to``
for cross-engine hash equality (the repo's float policy).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.hashing import MINHASH_P
from nahuatl_data_pipeline_spark.operators.similarity import (
    _dot,
    cosine_cols,
)


def srp_signs(n_bits: int, dim: int, bit_offset: int = 0) -> list[list[float]]:
    """The deterministic ±1 hyperplane matrix, bit-major: row j is the
    64-dim hyperplane for bit j. Entry (j, d) is +1 iff
    hash64(f"{j}:{d}") is even — byte-identical to the SQL mirror
    ``CAST('0x' || SUBSTRING(MD5(j || ':' || d), 1, 15) AS BIGINT)
    % P % 2 = 0`` because md5 is md5 everywhere.

    ``bit_offset`` shifts the md5 seed index (row j seeds as
    ``j + bit_offset``) so OR-amplified multi-table callers
    (similarity.srp_topk n_tables > 1) draw INDEPENDENT hyperplane
    sets; the default 0 leaves every existing seed unchanged."""
    return [
        [
            1.0
            if int(
                hashlib.md5(f"{j + bit_offset}:{d}".encode()).hexdigest()[:15],
                16,
            )
            % MINHASH_P
            % 2
            == 0
            else -1.0
            for d in range(dim)
        ]
        for j in range(n_bits)
    ]


def srp_cell(vec_col, n_bits: int, dim: int, bit_offset: int = 0) -> F.Column:
    """Sign-random-projection cell id (0 .. 2^n_bits - 1) of a
    fixed-``dim`` array<float/double> column, as one shuffle-free
    expression: Σ_j [ <v, r_j> > 0 ] · 2^j with literal ±1 hyperplanes
    (no hyperplane table, no join). ``bit_offset`` selects an
    independent hyperplane set (see srp_signs); 0 = the certified
    q140/q168 planes."""
    from nahuatl_data_pipeline_spark.functions.fastlit import (
        double_matrix_lit,
    )

    v = F.transform(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col,
        lambda x: x.cast("double"),
    )
    # The ±1 hyperplane matrix is ONE parsed SQL literal (fastlit.py)
    # looped with transform-with-index instead of n_bits unrolled
    # dot-product expressions built element-wise through py4j (~0.25 s
    # of driver time per call at 8×64, twice per query). The fold is
    # the same left-to-right Σ_j bit_j·2^j over the same per-plane
    # sign tests — integer math, value-identical (q140/q168 oracles +
    # test_semantic_dedup pin it).
    planes = double_matrix_lit(srp_signs(n_bits, dim, bit_offset))
    pow2 = F.expr(
        "array(" + ",".join(f"{1 << j}L" for j in range(n_bits)) + ")"
    )
    bits = F.transform(
        planes,
        lambda rj, j: F.when(_dot(v, rj) > 0, F.get(pow2, j)).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    dim: int = 64,
    tau: float = 0.7,
    round_to: int = 4,
) -> DataFrame:
    """One row per input vector: ``(id, cell, keeper_id, cosine, kept)``.

    ``keeper_id`` is the min-id representative of the vector's SRP
    cell; ``kept`` is False exactly when the vector is a non-keeper
    whose (rounded) cosine to the keeper reaches ``tau`` — i.e. the
    semantic near-duplicates SemDeDup discards. Downstream selection is
    ``.filter("kept")``; the full audit row set is returned so drop
    accounting composes with the pipeline's Observation counters.

    Rows with NULL or wrong-arity vectors carry no geometry and are
    excluded (same contract as the other embedding operators)."""
    from pyspark.sql import Window

    base = df.select(F.col(id_col), F.col(vec_col)).where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    )
    # keeper id via a window min over the cell — the SRP projection is
    # evaluated in ONE subtree (a groupBy(cell)+join-back formulation
    # would replay the 512-multiply fold per consumer), and the window
    # is the same single shuffle the groupBy would cost
    withk = base.withColumn("cell", srp_cell(vec_col, n_bits, dim)).withColumn(
        "keeper_id",
        F.min(id_col).over(Window.partitionBy("cell")),
    )
    # the keeper's vector comes from a fresh column-pruned re-scan of
    # the SOURCE (no SRP recompute), keyed-joined on keeper_id — one
    # row per member; no broadcast assumption (at 2^20 cells this is
    # corpus-co-partitioned work, and AQE may still elect a broadcast
    # when it fits)
    kvec = base.select(
        F.col(id_col).alias("keeper_id"), F.col(vec_col).alias("__kv")
    )
    cos = F.round(cosine_cols(F.col(vec_col), F.col("__kv")), round_to)
    return (
        withk.join(kvec, "keeper_id")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.col("keeper_id"),
            cos.alias("cosine"),
            (
                (F.col(id_col) == F.col("keeper_id")) | (cos < F.lit(tau))
            ).alias("kept"),
        )
    )
