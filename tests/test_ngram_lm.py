"""Self-trained bigram LM scoring: hand-computed probabilities, prose vs
noise separation, and edge cases."""

from __future__ import annotations

import math

from nahuatl_data_pipeline_spark.operators.ngram_lm import (
    bigram_logprob,
    bigram_occurrences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_occurrences_adjacency_and_short_doc_drop(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "only"), (3, None), (4, "  ")])
    got = sorted(
        (r["doc_id"], r["w1"], r["w2"])
        for r in bigram_occurrences(docs, "doc_id", "text").collect()
    )
    assert got == [(1, "a", "b"), (1, "b", "c")]


def test_logprob_hand_computed(spark):
    """Corpus 'a b', 'a b', 'a c': V=3, c(a)=3, c(a,b)=2, c(a,c)=1.
    With α=0.1: P(b|a)=(2.1)/(3.3), P(c|a)=(1.1)/(3.3)."""
    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    got = {
        r["doc_id"]: (r["avg_logprob"], r["n_bigrams"])
        for r in bigram_logprob(docs, "doc_id", "text", alpha=0.1).collect()
    }
    assert got[1] == (round(math.log(2.1 / 3.3), 4), 1)
    assert got[1] == got[2]  # identical docs, identical scores
    assert got[3] == (round(math.log(1.1 / 3.3), 4), 1)


def test_logprob_separates_prose_from_noise(spark):
    """Repeated natural phrasing scores higher than a unique random
    token soup under the corpus's own statistics — the filter signal."""
    prose = [(i, "the cat sat on the mat") for i in range(20)]
    noise = [(100, "zq vx jk wp qn rl")]
    docs = _docs(spark, prose + noise)
    scored = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_logprob(docs, "doc_id", "text").collect()
    }
    assert scored[0] > scored[100]
    assert all(scored[i] == scored[0] for i in range(20))
