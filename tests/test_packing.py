"""Cross-document sequence packing (concat-and-chop)."""

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.packing import (
    pack_sequences,
    sequence_pieces,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_offsets_are_exclusive_prefix_sums(spark):
    df = _docs(spark, ["a b c", "d e", "f g h i", "j"])
    out = pack_sequences(df, "doc_id", seq_len=4).collect()
    rows = sorted(out, key=lambda r: r["start_offset"])
    # stream is a permutation of the docs; offsets tile it exactly
    off = 0
    for r in rows:
        assert r["start_offset"] == off
        off += r["n_tokens"]
    assert off == 10
    assert {r["n_tokens"] for r in rows} == {3, 2, 4, 1}


def test_against_pure_python_reference(spark):
    """Independent reimplementation: hashlib md5 order + a Python loop —
    not the Spark formulas — must reproduce every output column."""
    import hashlib

    texts = ["a b c", "d e", "f g h i", "j", None, "  ", "k l m n o p"]
    df = _docs(spark, texts)
    n_tok = [3, 2, 4, 1, 0, 0, 6]
    order = sorted(
        range(len(texts)),
        key=lambda i: hashlib.md5(f"7:{i}".encode()).hexdigest(),
    )
    expected, off = {}, 0
    for i in order:
        t = n_tok[i]
        seq_id = off // 4
        n_seqs = 0 if t == 0 else (off + t - 1) // 4 - seq_id + 1
        expected[i] = (t, off, seq_id, n_seqs)
        off += t
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_offset"],
            r["seq_id"],
            r["n_seqs"],
        )
        for r in pack_sequences(df, "doc_id", seq_len=4, seed=7).collect()
    }
    assert got == expected


def test_empty_and_null_docs(spark):
    df = _docs(spark, ["a b", None, "   ", "c"])
    rows = {r["doc_id"]: r for r in pack_sequences(df, "doc_id").collect()}
    assert len(rows) == 4
    assert rows[1]["n_tokens"] == 0 and rows[1]["n_seqs"] == 0
    assert rows[2]["n_tokens"] == 0 and rows[2]["n_seqs"] == 0


def test_partition_independence(spark):
    df = _docs(spark, [f"tok{i} tok{i} x" for i in range(40)])
    a = {
        (r["doc_id"], r["start_offset"])
        for r in pack_sequences(df.repartition(1), "doc_id").collect()
    }
    b = {
        (r["doc_id"], r["start_offset"])
        for r in pack_sequences(df.repartition(13), "doc_id").collect()
    }
    assert a == b


def test_seed_changes_order(spark):
    df = _docs(spark, [f"w{i} w{i}" for i in range(20)])
    a = {r["doc_id"]: r["start_offset"] for r in pack_sequences(df, "doc_id", seed=1).collect()}
    b = {r["doc_id"]: r["start_offset"] for r in pack_sequences(df, "doc_id", seed=2).collect()}
    assert a != b  # different shuffle
    assert sorted(a.values()) == sorted(b.values())  # same token stream sizes


def test_invalid_seq_len(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, ["a"]), "doc_id", seq_len=0)


def test_pieces_tile_sequences_exactly(spark):
    texts = [" ".join(f"t{i}_{j}" for j in range(7)) for i in range(30)]
    texts.append(None)
    df = _docs(spark, texts)
    packed = pack_sequences(df, "doc_id", seq_len=16)
    pieces = sequence_pieces(packed, "doc_id", seq_len=16)

    # per-document: pieces cover the doc's tokens contiguously
    per_doc = (
        pieces.groupBy("doc_id")
        .agg(F.sum("piece_len").alias("s"), F.min("piece_begin").alias("b"))
        .collect()
    )
    n_tok = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    for r in per_doc:
        assert r["s"] == n_tok[r["doc_id"]]
        assert r["b"] == 0

    # per-sequence: every sequence except the last holds exactly seq_len
    per_seq = sorted(
        pieces.groupBy("seq_id").agg(F.sum("piece_len").alias("s")).collect(),
        key=lambda r: r["seq_id"],
    )
    total = 30 * 7
    assert [r["seq_id"] for r in per_seq] == list(range(len(per_seq)))
    for r in per_seq[:-1]:
        assert r["s"] == 16
    assert per_seq[-1]["s"] == total - 16 * (len(per_seq) - 1)

    # empty doc contributes no pieces
    assert pieces.filter(F.col("doc_id") == 30).count() == 0
