"""LLM external-call stages (SURVEY.md §2.10 M4/M5): distillation and
LLM-judge scoring as Arrow-batched ``mapInPandas`` operators.

The reference drives its LLM calls from a single-process asyncio loop
(``scripts/gemini_distiller.py:96-195``) or a thread pool
(``scripts/diamond_miner_v5.py:80-140``); at 100 TB the call fan-out must
instead ride the data partitioning: each Spark task owns its partition's
rows, batches them into prompts, and talks to the endpoint with the same
resilience contract the reference implements —

- batch prompts: N rows per request (``gemini_distiller.py:122-146``)
- retry budget ``retries × len(api_keys)`` (``:151-155``)
- rate-limit → rotate key immediately when >1 key, else exponential
  backoff ``base**(attempt % 3) + interval`` (``:176-187``)
- other errors → fixed 2 s sleep, retry (``:189-193``)
- exhausted attempts → batch yields error rows, pipeline continues
  (``:194-195`` returns [])
- fence-strip + JSON-array parse, dict promoted to [dict]
  (``:163-174``); malformed JSON isolates the BATCH, never kills the
  stage (``diamond_miner_v5.py:101-104`` returns [])

The model client is pluggable (``client_factory(api_key) → client`` with
``complete(prompt) → str``): real SDKs aren't in this container, so tests
and the registered query q48 run a deterministic :class:`MockLlmClient`
whose output is a pure function of the prompt — which makes the whole
mapInPandas plumbing oracle-checkable in SQL.

Scale notes: state (client, key index) lives per-task, created lazily
inside ``mapInPandas`` — nothing driver-side is serialized except the
picklable factory; backoff sleeps block only the calling task's core, and
``repartition(n)`` upstream is the throughput knob (tasks ≈ concurrent
request streams), exactly how the reference tunes its worker count.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame


class LlmRateLimitError(Exception):
    """Endpoint signalled resource exhaustion (429-class). Triggers key
    rotation / backoff, mirroring google.api_core ResourceExhausted
    handling at gemini_distiller.py:176."""


def parse_json_array(text: str) -> list[dict]:
    """Fence-strip + parse a JSON array reply; a bare object is promoted
    to a one-element list (gemini_distiller.py:163-174). Raises
    ``ValueError`` on anything else — the caller isolates the batch."""
    t = text.strip()
    # models fence with ```json, bare ```, or other language tags — strip
    # any leading fence line and a trailing fence
    if t.startswith("```"):
        first_nl = t.find("\n")
        t = t[first_nl + 1 :] if first_nl != -1 else t[3:]
    if t.endswith("```"):
        t = t[:-3]
    data = json.loads(t)
    if isinstance(data, dict):
        data = [data]
    if not isinstance(data, list):
        raise ValueError(f"expected JSON array, got {type(data).__name__}")
    for item in data:
        if not isinstance(item, dict):
            raise ValueError(
                f"array elements must be objects, got {type(item).__name__}"
            )
    return data


@dataclass(frozen=True)
class RetryPolicy:
    """Resilience contract of gemini_distiller.py:151-195."""

    api_keys: tuple[str, ...] = ("unset",)
    retries: int = 3
    backoff_base: float = 2.0
    request_interval: float = 1.0
    error_sleep: float = 2.0

    @property
    def max_attempts(self) -> int:
        return self.retries * len(self.api_keys)


class _TaskClient:
    """Per-task client holder: lazy construction, key rotation."""

    def __init__(self, factory, policy: RetryPolicy, sleep_fn):
        self._factory = factory
        self._policy = policy
        self._sleep = sleep_fn
        self._key_idx = 0
        self._client = None

    def _current(self):
        if self._client is None:
            self._client = self._factory(self._policy.api_keys[self._key_idx])
        return self._client

    def _rotate(self):
        self._key_idx = (self._key_idx + 1) % len(self._policy.api_keys)
        self._client = None

    def complete_with_retry(self, prompt: str) -> str | None:
        """None = attempts exhausted (caller emits error rows)."""
        p = self._policy
        for attempt in range(p.max_attempts):
            try:
                return self._current().complete(prompt)
            except LlmRateLimitError:
                if len(p.api_keys) > 1:
                    self._rotate()  # no sleep: retry on the fresh key
                    continue
                if attempt < p.max_attempts - 1:  # no sleep before giving up
                    self._sleep(
                        p.backoff_base ** (attempt % 3) + p.request_interval
                    )
            except Exception:
                if attempt == p.max_attempts - 1:
                    return None
                self._sleep(p.error_sleep)
        return None


def llm_map_batches(
    df: DataFrame,
    build_prompt: Callable[[list[dict]], str],
    parse_batch: Callable[[str, list[dict]], list[dict]],
    out_fields: list[tuple[str, str]],
    client_factory: Callable[[str], object],
    policy: RetryPolicy = RetryPolicy(),
    keep_cols: list[str] | None = None,
    batch_size: int = 5,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Generic external-call stage: rows → prompt batches → parsed rows.

    ``parse_batch(response_text, batch_rows)`` returns one output dict per
    input row (raise to flag the batch malformed). Output columns =
    ``keep_cols`` + ``out_fields`` + ``llm_error`` (null on success; the
    failure reason on exhausted retries / malformed replies — failed
    batches are isolated, never raised)."""
    keep_cols = keep_cols if keep_cols is not None else list(df.columns)
    payload_cols = list(df.columns)
    out_names = [n for n, _ in out_fields]
    schema = ", ".join(
        [f"{c} {t}" for c, t in zip(keep_cols, _ddl_types(df, keep_cols))]
        + [f"{n} {t}" for n, t in out_fields]
        + ["llm_error string"]
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = _TaskClient(client_factory, policy, sleep_fn)
        for pdf in pdfs:
            out_rows: list[dict] = []
            records = pdf[payload_cols].to_dict("records")
            for i in range(0, len(records), batch_size):
                batch = records[i : i + batch_size]
                reply = tc.complete_with_retry(build_prompt(batch))
                if reply is None:
                    parsed, err = None, "exhausted_retries"
                else:
                    try:
                        parsed = parse_batch(reply, batch)
                        if len(parsed) != len(batch):
                            raise ValueError(
                                f"{len(parsed)} outputs for {len(batch)} inputs"
                            )
                        for item in parsed:
                            if not isinstance(item, dict):
                                raise ValueError(
                                    "parse_batch must yield dicts, got "
                                    + type(item).__name__
                                )
                        err = None
                    except Exception as exc:  # malformed reply: isolate batch
                        parsed, err = None, f"malformed_response: {exc}"
                for j, row in enumerate(batch):
                    out = {c: row[c] for c in keep_cols}
                    for n in out_names:
                        out[n] = parsed[j].get(n) if parsed is not None else None
                    out["llm_error"] = err
                    out_rows.append(out)
            yield pd.DataFrame(
                out_rows, columns=keep_cols + out_names + ["llm_error"]
            )

    return df.mapInPandas(run, schema=schema)


def _ddl_types(df: DataFrame, cols: list[str]) -> list[str]:
    m = dict(zip(df.schema.names, (f.dataType.simpleString() for f in df.schema)))
    return [m[c] for c in cols]


# ---------------------------------------------------------------------------
# M4: distillation stage (gemini_distiller.py:122-174)
# ---------------------------------------------------------------------------

_PAYLOAD_OPEN = "Input Spanish Text:"
_PAYLOAD_CLOSE = "RETURN ONLY A VALID JSON ARRAY."


def build_distill_prompt(batch: list[dict], text_col: str = "text") -> str:
    """The reference's translation prompt (_build_prompt, :122-146):
    role header + JSON-dumped source array + strict output contract."""
    texts = [r[text_col] for r in batch]
    return (
        "Act as a high-level linguist and polyglot expert in Indigenous "
        "languages of Mexico.\n"
        "Translate the following Spanish text fragments into "
        "Classical/Central Nahuatl and Yucatec Maya.\n"
        f"{_PAYLOAD_OPEN}\n"
        f"{json.dumps(texts, ensure_ascii=False)}\n"
        f"{_PAYLOAD_CLOSE} No markdown formatting, no explanations.\n"
        'Target Format: [{"es": "...", "nah": "...", "myn": "..."}]'
    )


def parse_distill_batch(reply: str, batch: list[dict]) -> list[dict]:
    return parse_json_array(reply)


def distill_stage(
    df: DataFrame,
    text_col: str,
    client_factory: Callable[[str], object],
    policy: RetryPolicy = RetryPolicy(),
    keep_cols: list[str] | None = None,
    batch_size: int = 5,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """M4: batch-translate ``text_col`` via the external model; output one
    row per input with ``es``/``nah``/``myn`` (null + llm_error on
    failure)."""
    return llm_map_batches(
        df,
        build_prompt=lambda b: build_distill_prompt(b, text_col),
        parse_batch=parse_distill_batch,
        out_fields=[("es", "string"), ("nah", "string"), ("myn", "string")],
        client_factory=client_factory,
        policy=policy,
        keep_cols=keep_cols,
        batch_size=batch_size,
        sleep_fn=sleep_fn,
    )


# ---------------------------------------------------------------------------
# M5: LLM-judge scoring (benchmark_phd_v1.py:52-88)
# ---------------------------------------------------------------------------

def build_judge_prompt(batch: list[dict]) -> str:
    """Rubric prompt over (source, reference, hyp) rows; the reference
    scores row-at-a-time (:66-80) — batching N rows per request is the
    distributed upgrade, same rubric."""
    payload = [
        {"source": r["source"], "reference": r["reference"], "hyp": r["hyp"]}
        for r in batch
    ]
    return (
        "Act as an expert Nahuatl linguist. Score each translation 1-5 "
        "(5 native/academic, 4 fluent, 3 understandable, 2 fragmented, "
        "1 unintelligible).\n"
        f"{_PAYLOAD_OPEN}\n"
        f"{json.dumps(payload, ensure_ascii=False)}\n"
        f'{_PAYLOAD_CLOSE} Target Format: [{{"score": 5}}]'
    )


def parse_judge_batch(reply: str, batch: list[dict]) -> list[dict]:
    out = parse_json_array(reply)
    for item in out:
        s = int(item["score"])
        if not 1 <= s <= 5:
            raise ValueError(f"score {s} outside rubric 1-5")
        item["score"] = s
    return out


def judge_stage(
    df: DataFrame,
    source_col: str,
    reference_col: str,
    hyp_col: str,
    client_factory: Callable[[str], object],
    policy: RetryPolicy = RetryPolicy(),
    keep_cols: list[str] | None = None,
    batch_size: int = 5,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """M5: rubric-score (source, reference, hypothesis) triples 1-5."""
    renamed = df.withColumnsRenamed(
        {source_col: "source", reference_col: "reference", hyp_col: "hyp"}
    )
    keep = keep_cols if keep_cols is not None else list(renamed.columns)
    return llm_map_batches(
        renamed,
        build_prompt=build_judge_prompt,
        parse_batch=parse_judge_batch,
        out_fields=[("score", "int")],
        client_factory=client_factory,
        policy=policy,
        keep_cols=keep,
        batch_size=batch_size,
        sleep_fn=sleep_fn,
    )


# ---------------------------------------------------------------------------
# Deterministic mock client (tests + q48): output is a pure function of
# the prompt, so the full mapInPandas path is SQL-oracle-checkable.
# ---------------------------------------------------------------------------

def _extract_payload(prompt: str) -> list:
    start = prompt.index(_PAYLOAD_OPEN) + len(_PAYLOAD_OPEN)
    end = prompt.index(_PAYLOAD_CLOSE)
    return json.loads(prompt[start:end].strip())


@dataclass
class MockLlmClient:
    """Deterministic stand-in for the model endpoint.

    - distill prompts → echoes each text as es, prefixes ``nah:`` /
      ``myn:`` for the translations
    - judge prompts → score = (len(hyp) % 5) + 1
    - ``api_key`` in ``exhausted_keys`` → always LlmRateLimitError
    - any payload text containing ``MALFORMED`` → non-JSON reply
    - ``fail_first`` > 0 → first N calls raise RuntimeError (transient)
    """

    api_key: str = "k0"
    exhausted_keys: tuple[str, ...] = ()
    fail_first: int = 0
    calls: int = field(default=0, compare=False)

    def complete(self, prompt: str) -> str:
        self.calls += 1
        if self.api_key in self.exhausted_keys:
            raise LlmRateLimitError(f"key {self.api_key} exhausted")
        if self.calls <= self.fail_first:
            raise RuntimeError("transient endpoint error")
        payload = _extract_payload(prompt)
        if any("MALFORMED" in json.dumps(p) for p in payload):
            return "I'm sorry, I can't produce JSON today."
        if payload and isinstance(payload[0], dict):  # judge
            # null-safe: a None hyp scores like an empty one (a TypeError
            # here would masquerade as a transient endpoint error and
            # burn the whole batch's retry budget)
            return json.dumps(
                [{"score": (len(p["hyp"] or "") % 5) + 1} for p in payload]
            )
        return "```json\n" + json.dumps(
            [
                {"es": t, "nah": None, "myn": None}
                if t is None
                else {"es": t, "nah": "nah:" + t, "myn": "myn:" + t}
                for t in payload
            ],
            ensure_ascii=False,
        ) + "\n```"
