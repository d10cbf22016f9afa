"""Hash-based ids and engine-portable MinHash signatures.

``content_id`` mirrors the reference's content-addressed Bronze ids
(``pipeline/ingestion/manager.py:17-21``: sha256(url+ts)[:16]).

``minhash_signature_cols`` is a *deterministic, engine-portable* MinHash:
permutation_i(token) = md5(i || ':' || token), signature_i = lexicographic
MIN over the doc's token set. Because md5 is identical everywhere, the same
signature is computable in any SQL engine — which makes near-dup candidate
generation oracle-checkable, unlike seeded ``pyspark.ml`` MinHashLSH
(that lives in operators/fuzzy_dedup.py as the scale path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def content_id(*cols: ColumnOrName, length: int = 16, sep: str = "_") -> Column:
    """sha256(concat_ws(sep, cols))[:length] — content-addressed id
    (manager.py:17-21)."""
    return F.substring(
        F.sha2(F.concat_ws(sep, *[_col(c) for c in cols]), 256), 1, length
    )


def token_set(c: ColumnOrName, lowercase: bool = True) -> Column:
    """Distinct whitespace tokens (deduplication.py:15 tokenization)."""
    base = F.lower(_col(c)) if lowercase else _col(c)
    return F.array_distinct(
        F.filter(F.split(F.trim(base), r"\s+"), lambda t: t != "")
    )


def word_shingles(c: ColumnOrName, n: int = 3, lowercase: bool = True) -> Column:
    """n-gram word shingles as array<string> (distinct).

    Built with transform over a sequence of start offsets — no explode, no
    UDF; the shingle array is built per-row inside codegen.
    """
    if n == 1:
        return token_set(c, lowercase=lowercase)
    toks = F.filter(
        F.split(F.trim(F.lower(_col(c)) if lowercase else _col(c)), r"\s+"),
        lambda t: t != "",
    )
    # guard: sequence(0, -1) would DESCEND, not return empty — short docs
    # (< n tokens) must yield an empty shingle array explicitly
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature_cols(
    shingles: Column, num_hashes: int = 8, prefix: str = "mh"
) -> list[Column]:
    """num_hashes MinHash components over a shingle array.

    Component i = min(md5(i || ':' || shingle)) as a hex string; string MIN
    is lexicographic in every engine, so signatures are portable. Returns a
    list of aliased Columns ``mh0..mh{k-1}``.
    """
    # NB: the per-element lambda must take exactly ONE parameter — a second
    # parameter would be bound by Spark to the array index, not the closure.
    def component(i: int) -> Column:
        return F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat_ws(":", F.lit(str(i)), s)))
        ).alias(f"{prefix}{i}")

    return [component(i) for i in range(num_hashes)]


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash over a shingle array, as a bigint.

    For each bit b, sum ±1 over shingle hashes (xxhash64) and take the sign.
    Expressed with aggregate over the shingle array — per-row, no shuffle.
    """
    def bit(b: int) -> Column:
        # bit 63 is the sign bit of a signed long: use the negative literal
        mask = (1 << b) if b < 63 else -(1 << 63)
        votes = F.aggregate(
            shingles,
            F.lit(0),
            # exactly two parameters: (acc, element) — extra params would be
            # misinterpreted by Spark's lambda-arity dispatch
            lambda acc, s: acc
            + F.when(F.xxhash64(s).bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(mask)).otherwise(F.lit(0)).cast("long")

    out = F.lit(0).cast("long")
    for b in range(64):
        out = out.bitwiseOR(bit(b))
    return out
