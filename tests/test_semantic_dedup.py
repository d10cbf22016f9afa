"""SemDeDup-over-SRP-cells (operators/semantic_dedup.py), CCNet
perplexity bucketing (ngram_lm.perplexity_buckets) and tokenizer
fertility (q142) — unit semantics on hand-built data; full engine
parity runs via the q140/q141/q142 oracles."""

import hashlib

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.functions.hashing import MINHASH_P
from nahuatl_data_pipeline_spark.operators.semantic_dedup import (
    semantic_dedup,
    srp_cell,
    srp_signs,
)
from tests.conftest import SF_SMOKE


def _emb(spark, rows, dim=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<double>",
    )


def test_srp_signs_deterministic_and_pm1():
    a = srp_signs(4, 8)
    b = srp_signs(4, 8)
    assert a == b
    assert all(s in (1.0, -1.0) for row in a for s in row)
    # spot-check one entry against the md5 formula by hand
    j, d = 2, 5
    expect = (
        1.0
        if int(hashlib.md5(b"2:5").hexdigest()[:15], 16) % MINHASH_P % 2 == 0
        else -1.0
    )
    assert a[j][d] == expect


def test_identical_vectors_share_cell_and_dups_dropped(spark):
    v = [0.3, -1.2, 0.8, 0.5]
    w = [-2.0, 0.1, 0.0, 1.5]
    df = _emb(spark, [(1, v), (2, v), (3, v), (10, w)], dim=4)
    out = semantic_dedup(df, n_bits=4, dim=4, tau=0.99).collect()
    rows = {r["vec_id"]: r for r in out}
    # clones land in one cell with min-id keeper; only the keeper kept
    assert rows[1]["keeper_id"] == 1 and rows[1]["kept"]
    for i in (2, 3):
        assert rows[i]["keeper_id"] == 1
        assert rows[i]["cosine"] == pytest.approx(1.0)
        assert not rows[i]["kept"]
    # w is its own keeper (either own cell, or below tau vs keeper 1)
    assert rows[10]["kept"]


def test_below_tau_members_survive(spark):
    # orthogonal-ish vectors that may share a cell must survive tau=0.999
    df = _emb(
        spark,
        [(1, [1.0, 0.01, 0.0, 0.0]), (2, [1.0, -0.01, 0.0, 0.0])],
        dim=4,
    )
    out = {r["vec_id"]: r for r in semantic_dedup(
        df, n_bits=2, dim=4, tau=1.01).collect()}
    assert all(r["kept"] for r in out.values())  # tau never reached


def test_null_and_wrong_arity_vectors_excluded(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, n_bits=2, dim=2).collect()
    assert {r["vec_id"] for r in out} == {1}


def test_sign_margin_far_from_float_noise(spark):
    """The oracle-parity argument: no projection sits near the sign
    boundary at the test SF, so fold-order float noise can never flip
    a cell bit cross-engine."""
    from nahuatl_data_pipeline_spark.operators.similarity import _dot

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    v = F.transform("embedding", lambda x: x.cast("double"))
    mins = []
    for j, row in enumerate(srp_signs(8, 64)):
        plane = F.array(*[F.lit(s) for s in row])
        mins.append(F.min(F.abs(_dot(v, plane))).alias(f"m{j}"))
    r = emb.agg(*mins).collect()[0]
    assert min(r) > 1e-6, dict(r.asDict())


def test_perplexity_buckets_semantics(spark):
    from nahuatl_data_pipeline_spark.operators.ngram_lm import (
        perplexity_buckets,
    )

    # one lang, 6 docs: 3 made of a very common bigram (fluent), 3 of
    # rare one-off bigrams (tail); the common docs must outrank them
    rows = [(i, "the cat sat", "en") for i in range(3)]
    rows += [(10 + i, f"zzz{i} qqq{i} xxx{i}", "en") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(docs, "doc_id", "text", "lang").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 6
    common = [by_id[i] for i in range(3)]
    rare = [by_id[10 + i] for i in range(3)]
    assert min(c["avg_logprob"] for c in common) > max(
        r["avg_logprob"] for r in rare
    )
    # tertiles over 6 rows: bottom 2 tail, middle 2, top 2 head —
    # every common doc outranks every rare doc
    assert all(c["bucket"] != "tail" for c in common)
    assert all(r["bucket"] == "tail" for r in rare)
    # head/middle always kept; tail kept only by the hash draw
    assert all(c["kept"] for c in common)
    for r in rare:
        h = int(
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16
        ) % MINHASH_P % 100
        assert r["kept"] == (h < 30)


def test_fertility_ratios_and_empty_source(spark):
    from nahuatl_data_pipeline_spark.registry import queries
    import duckdb

    # hand case through the operator path used by q142
    from nahuatl_data_pipeline_spark.functions.text_analysis import (
        bpe_ish_token_count,
        token_count,
    )

    docs = spark.createDataFrame(
        [(1, "ab cd", "s1"), (2, None, "s2")],
        "doc_id long, text string, source string",
    )
    r = (
        docs.groupBy("source")
        .agg(
            F.coalesce(F.sum(token_count("text")), F.lit(0)).alias("ws"),
            F.coalesce(F.sum(bpe_ish_token_count("text")), F.lit(0)).alias(
                "bpe"
            ),
            F.coalesce(F.sum(F.octet_length("text")), F.lit(0)).alias("b"),
        )
        .collect()
    )
    by = {x["source"]: x for x in r}
    assert by["s1"]["ws"] == 2 and by["s1"]["bpe"] == 2 and by["s1"]["b"] == 5
    assert by["s2"]["ws"] == 0 and by["s2"]["bpe"] == 0 and by["s2"]["b"] == 0
