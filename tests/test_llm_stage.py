"""LLM external-call stage: retry/rotation/backoff semantics (pure unit
tests on _TaskClient — mirrors gemini_distiller.py:151-195), and the
mapInPandas plumbing (batching, malformed isolation, error rows) via the
deterministic mock client."""

from __future__ import annotations

from functools import partial

import pytest

from nahuatl_data_pipeline_spark.operators.llm_stage import (
    LlmRateLimitError,
    MockLlmClient,
    RetryPolicy,
    _TaskClient,
    build_distill_prompt,
    distill_stage,
    judge_stage,
    parse_json_array,
)


# --- parse_json_array (gemini_distiller.py:163-174) ------------------------

def test_parse_json_array_strips_fences():
    assert parse_json_array('```json\n[{"a": 1}]\n```') == [{"a": 1}]


def test_parse_json_array_promotes_dict():
    assert parse_json_array('{"a": 1}') == [{"a": 1}]


def test_parse_json_array_rejects_non_array():
    with pytest.raises(ValueError):
        parse_json_array('"just a string"')
    with pytest.raises(Exception):
        parse_json_array("not json at all")


# --- retry / rotation / backoff (no Spark) ---------------------------------

class _Recorder:
    def __init__(self):
        self.sleeps: list[float] = []

    def __call__(self, s: float):
        self.sleeps.append(s)


def _prompt(texts):
    return build_distill_prompt([{"text": t} for t in texts])


def test_rotation_on_rate_limit_no_sleep():
    policy = RetryPolicy(api_keys=("dead", "live"), retries=3)
    rec = _Recorder()
    tc = _TaskClient(
        partial(MockLlmClient, exhausted_keys=("dead",)), policy, rec
    )
    reply = tc.complete_with_retry(_prompt(["hola"]))
    assert reply is not None and "nah:hola" in reply
    assert rec.sleeps == []  # rotation is immediate, never sleeps


def test_single_key_backoff_sequence_then_exhausted():
    policy = RetryPolicy(
        api_keys=("dead",), retries=3, backoff_base=2.0, request_interval=1.0
    )
    rec = _Recorder()
    tc = _TaskClient(
        partial(MockLlmClient, exhausted_keys=("dead",)), policy, rec
    )
    assert tc.complete_with_retry(_prompt(["hola"])) is None
    # 2**(attempt%3) + interval for attempts 0,1 (gemini_distiller.py:184);
    # no sleep before the final give-up
    assert rec.sleeps == [2.0, 3.0]


def test_transient_error_fixed_sleep_then_success():
    policy = RetryPolicy(api_keys=("k",), retries=3, error_sleep=2.0)
    rec = _Recorder()
    tc = _TaskClient(partial(MockLlmClient, fail_first=2), policy, rec)
    reply = tc.complete_with_retry(_prompt(["hola"]))
    assert reply is not None
    assert rec.sleeps == [2.0, 2.0]  # fixed error sleep, not backoff


def test_all_keys_exhausted_returns_none():
    policy = RetryPolicy(api_keys=("d1", "d2"), retries=2)
    rec = _Recorder()
    tc = _TaskClient(
        partial(MockLlmClient, exhausted_keys=("d1", "d2")), policy, rec
    )
    assert tc.complete_with_retry(_prompt(["x"])) is None
    assert rec.sleeps == []  # multi-key: rotation only, no backoff


# --- Spark mapInPandas plumbing --------------------------------------------

@pytest.fixture()
def docs(spark):
    rows = [(i, f"frase número {i}") for i in range(7)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_distill_stage_happy_path(spark, docs):
    out = distill_stage(
        docs, "text", MockLlmClient, batch_size=3, sleep_fn=lambda s: None
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 7
    for i, r in rows.items():
        assert r["es"] == f"frase número {i}"
        assert r["nah"] == f"nah:frase número {i}"
        assert r["myn"] == f"myn:frase número {i}"
        assert r["llm_error"] is None


def test_malformed_reply_isolates_only_its_batch(spark):
    rows = [(1, "bueno uno"), (2, "MALFORMED aquí"), (3, "bueno dos"),
            (4, "bueno tres")]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    out = distill_stage(
        df, "text", MockLlmClient, batch_size=2, sleep_fn=lambda s: None
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # batch (1,2) poisoned by doc 2; batch (3,4) unaffected
    assert by_id[1]["llm_error"].startswith("malformed_response")
    assert by_id[2]["llm_error"].startswith("malformed_response")
    assert by_id[1]["nah"] is None
    assert by_id[3]["llm_error"] is None and by_id[3]["nah"] == "nah:bueno dos"
    assert by_id[4]["llm_error"] is None


def test_exhausted_retries_yield_error_rows_not_exception(spark, docs):
    out = distill_stage(
        docs,
        "text",
        partial(MockLlmClient, exhausted_keys=("k0",)),
        policy=RetryPolicy(api_keys=("k0",), retries=2),
        batch_size=4,
        sleep_fn=lambda s: None,
    ).collect()
    assert len(out) == 7
    assert all(r["llm_error"] == "exhausted_retries" for r in out)
    assert all(r["nah"] is None for r in out)


def test_judge_stage_scores_in_rubric_range(spark):
    rows = [(1, "hola", "niltze", "niltze"), (2, "adiós", "ma cualli", "mal")]
    df = spark.createDataFrame(
        rows, "pair_id long, src string, ref string, model_out string"
    )
    out = judge_stage(
        df, "src", "ref", "model_out", MockLlmClient,
        keep_cols=["pair_id"], sleep_fn=lambda s: None,
    ).collect()
    got = {r["pair_id"]: r["score"] for r in out}
    # deterministic mock: score = len(hyp) % 5 + 1
    assert got == {1: len("niltze") % 5 + 1, 2: len("mal") % 5 + 1}
    assert all(1 <= s <= 5 for s in got.values())


def test_rotation_inside_spark_task(spark, docs):
    out = distill_stage(
        docs,
        "text",
        partial(MockLlmClient, exhausted_keys=("dead",)),
        policy=RetryPolicy(api_keys=("dead", "live"), retries=3),
        batch_size=3,
        sleep_fn=lambda s: None,
    ).collect()
    assert all(r["llm_error"] is None for r in out)
    assert all(r["nah"].startswith("nah:") for r in out)


def test_bare_fence_and_language_tag_fences_accepted():
    assert parse_json_array('```\n[{"a": 1}]\n```') == [{"a": 1}]
    assert parse_json_array('```json\n[{"a": 1}]\n```') == [{"a": 1}]


def test_non_dict_array_elements_rejected_as_malformed():
    with pytest.raises(ValueError, match="must be objects"):
        parse_json_array('["hola", "adios"]')


def test_non_dict_reply_isolates_batch_not_stage(spark):
    """A valid JSON array of strings (right length!) must produce error
    rows, never crash the mapInPandas task (module contract)."""
    from nahuatl_data_pipeline_spark.operators.llm_stage import (
        llm_map_batches,
    )

    class RawClient:
        def __init__(self, api_key):
            pass

        def complete(self, prompt):
            return '["hola", "adios"]'

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = llm_map_batches(
        df,
        build_prompt=lambda b: "ignored",
        parse_batch=lambda reply, batch: parse_json_array(reply),
        out_fields=[("es", "string")],
        client_factory=RawClient,
        keep_cols=["doc_id"],
        batch_size=2,
        sleep_fn=lambda s: None,
    ).collect()
    assert len(out) == 2
    assert all(r["llm_error"].startswith("malformed_response") for r in out)
    assert all(r["es"] is None for r in out)


def test_null_text_rows_get_null_translations_not_retry_burn(spark):
    """A None text must NOT crash the mock (which would masquerade as a
    transient endpoint error and exhaust the batch's retries): the row
    gets null translations, batch-mates keep their results."""
    df = spark.createDataFrame(
        [(1, "hola"), (2, None), (3, "adiós")], "doc_id long, text string"
    ).coalesce(1)
    out = {r["doc_id"]: r for r in distill_stage(
        df, "text", MockLlmClient, batch_size=3, sleep_fn=lambda s: None
    ).collect()}
    assert out[1]["nah"] == "nah:hola" and out[1]["llm_error"] is None
    assert out[2]["nah"] is None and out[2]["llm_error"] is None
    assert out[3]["nah"] == "nah:adiós" and out[3]["llm_error"] is None


def test_no_sleep_before_final_giveup():
    policy = RetryPolicy(api_keys=("dead",), retries=1)
    rec = _Recorder()
    tc = _TaskClient(
        partial(MockLlmClient, exhausted_keys=("dead",)), policy, rec
    )
    assert tc.complete_with_retry(_prompt(["x"])) is None
    assert rec.sleeps == []  # single attempt: no pointless backoff
