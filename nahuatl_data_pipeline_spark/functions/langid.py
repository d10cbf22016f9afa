"""Language identification (reference ``src/transforms/normalizers.py:
298-346`` heuristic + ``pipeline/processing/lid.py:11-43`` fastText
variant).

Two paths:

- ``detect_language``: pure Spark expression cascade — no model, no UDF —
  so LID over 100 TB is a codegen'd scan.
- ``load_lid_model`` + ``detect_language_model``: the pluggable model
  path. The model file is loaded ONCE on the driver, broadcast to
  executors, and applied inside an Arrow-batched pandas_udf (one scorer
  call per batch, never per row). ``.bin``/``.ftz`` files route to the
  ``fasttext`` library when installed (the reference's lid.py deployment);
  ``.json`` files use the built-in linear bag-of-tokens scorer — the
  same load→broadcast→batch plumbing, testable with a committed fixture
  when no native model ships in the environment.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def detect_language(c: Column | str) -> Column:
    """Heuristic LID: macrons ⇒ nah; Náhuatl digraphs (tl/tz/kw/ku) ⇒ nah;
    Maya ejectives (k' ch' t' p' ts' ʔ) ⇒ myn; ¿ ¡ ñ ⇒ es; else NULL.

    Mirrors normalizers.py:298-346 ordering (macron test first — it is the
    strongest signal and must not be shadowed by the es test).

    Each signal family is ONE short-circuiting ``rlike`` over an
    alternation of the literals: the cascade only ever asked "count ≥ 1",
    and existence-of-any-literal ≡ one alternation match, so this replaces
    the original 10 per-branch ``regexp_replace`` length-diff counts
    (each a full-string rewrite + allocation) with at most 4 early-exit
    regex probes per value — the q154 sentence-LID hot path was
    regex-rewrite-bound at the 100× decade (SCALE.md round 8). Same
    predicate, same oracle SQL (the q18 oracle's per-literal counts sum
    to ≥ 1 iff the alternation matches).
    """
    col = F.col(c) if isinstance(c, str) else c
    low = F.lower(col)

    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(low.rlike("[āēīōū]"), F.lit("nah"))
        .when(low.rlike("tl|tz|kw|ku"), F.lit("nah"))
        .when(low.rlike("k'|ch'|t'|p'|ts'|ʔ"), F.lit("myn"))
        .when(low.rlike("[¿¡ñ]"), F.lit("es"))
        .otherwise(F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# Pluggable model path (pipeline/processing/lid.py:11-43 analogue)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LinearLidModel:
    """Linear bag-of-tokens language scorer (the JSON fixture format).

    ``token_weights[token][label]`` accumulates per lowercased whitespace
    token; the argmax label wins if its score clears ``threshold``, else
    ``default`` (None ⇒ NULL, matching the heuristic cascade).
    """

    labels: tuple[str, ...]
    token_weights: dict[str, dict[str, float]]
    threshold: float = 0.0
    default: str | None = None

    def predict(self, texts: list[str | None]) -> list[str | None]:
        out: list[str | None] = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            scores = dict.fromkeys(self.labels, 0.0)
            for tok in t.lower().split():
                for label, w in self.token_weights.get(tok, {}).items():
                    scores[label] = scores.get(label, 0.0) + w
            best = max(scores, key=lambda l: (scores[l], l), default=None)
            out.append(
                best if best is not None and scores[best] > self.threshold
                else self.default
            )
        return out


def load_lid_model(path: str):
    """Load a LID model artifact from disk (driver-side, call once).

    ``.bin``/``.ftz`` → ``fasttext.load_model`` (env-gated: raises
    ImportError with guidance when the library isn't installed — the
    test container ships no native models). Anything else → the JSON
    linear scorer, format::

        {"labels": ["nah", "es"],
         "token_weights": {"tlazohcamati": {"nah": 2.0}, ...},
         "threshold": 0.0, "default": null}

    Returns an object with ``predict(list[str|None]) -> list[str|None]``.
    """
    if path.endswith((".bin", ".ftz")):
        try:
            import fasttext  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "fastText model files need the 'fasttext' package; "
                "install it or export the model to the JSON linear format"
            ) from exc
        ft = fasttext.load_model(path)  # pragma: no cover - env-dependent

        class _FastTextAdapter:  # pragma: no cover - env-dependent
            def predict(self, texts):
                out = []
                for t in texts:
                    if t is None:
                        out.append(None)
                        continue
                    labels, _ = ft.predict(t.replace("\n", " "))
                    out.append(
                        labels[0].removeprefix("__label__")
                        if labels else None
                    )
                return out

        return _FastTextAdapter()  # pragma: no cover - env-dependent
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    return LinearLidModel(
        labels=tuple(raw["labels"]),
        token_weights={
            t: {l: float(w) for l, w in lw.items()}
            for t, lw in raw["token_weights"].items()
        },
        threshold=float(raw.get("threshold", 0.0)),
        default=raw.get("default"),
    )


def detect_language_model(
    c: Column | str, spark: SparkSession, model_path: str
) -> Column:
    """Model-backed LID column: load once on the driver, broadcast the
    model object, score Arrow batches in a pandas_udf — the same
    deployment shape a real fastText .bin would use on a 1000-executor
    cluster (model bytes ship once per executor, not per task)."""
    model = load_lid_model(model_path)
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf("string")
    def _lid(s: pd.Series) -> pd.Series:
        preds = bc.value.predict(
            [None if pd.isna(t) else t for t in s]
        )
        return pd.Series(preds, index=s.index, dtype=object)

    col = F.col(c) if isinstance(c, str) else c
    return _lid(col)
