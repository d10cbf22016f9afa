"""Pure ingestion parsers: bytes/items → reference-shaped rows (S6/S7,
SURVEY.md §2.1).

Every function here is NETWORK-FREE — the reference interleaves fetching
and parsing inside each driver (``pipeline/ingestion/drivers/*.py``);
splitting the parse stage out makes the per-dataset mapping logic
testable on local fixtures while the fetch stays gated in
``sources/drivers.py``. Row shapes mirror the reference's driver outputs
exactly; :func:`to_legacy_row` adapts any of them to the engine's
``LEGACY_INPUT_SCHEMA`` keys for ``legacy_coalesce``.

Parity map:
- bible txt/xml parse + min-length + fallback sample —
  ``driver_bible.py:10-80``
- tatoeba translation-key detection + config fallback order —
  ``driver_hf_tatoeba.py:9-79``
- unimorph lemma/form/tags — ``driver_hf_unimorph.py:9-41``
- flores sentence/sentence_es on dev/devtest — ``driver_hf_flores.py:9-40``
- americasnlp text/source/target + task default —
  ``driver_hf_americasnlp.py:9-40``
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable, Mapping, Sequence

# --------------------------------------------------------------------------
# S7: bible corpus (driver_bible.py)
# --------------------------------------------------------------------------

# offline fallback when no source is reachable (driver_bible.py:69-75)
BIBLE_FALLBACK_SAMPLE: list[dict] = [
    {
        "text": "In ipan pehuallotl, Dios quichiuh ilhuicatl ihuan tlaltipactli.",
        "source": "bible_example",
        "verse_id": 1,
    },
    {
        "text": "Ihuan Dios quitoh: Machihua tlanextli.",
        "source": "bible_example",
        "verse_id": 2,
    },
]

_MIN_VERSE_LEN = 10  # driver_bible.py:44,57 — filter empty/short lines

_VERSE_RE = re.compile(r"<verse[^>]*>(.*?)</verse>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def parse_bible_txt(content: str) -> list[dict]:
    """Plain-text bible: one verse per line, keep lines > 10 chars;
    verse_id = ORIGINAL line number, not the kept-row index
    (driver_bible.py:39-49 enumerates before filtering)."""
    out = []
    for i, line in enumerate(content.split("\n")):
        line = line.strip()
        if line and len(line) > _MIN_VERSE_LEN:
            out.append({"text": line, "source": "bible", "verse_id": i})
    return out


def parse_bible_xml(content: str) -> list[dict]:
    """XML bible: <verse> elements (DOTALL — verses span lines), inner
    tags stripped, same min-length filter; verse_id = match index
    (driver_bible.py:52-62)."""
    out = []
    for i, verse in enumerate(_VERSE_RE.findall(content)):
        clean = _TAG_RE.sub("", verse).strip()
        if clean and len(clean) > _MIN_VERSE_LEN:
            out.append({"text": clean, "source": "bible", "verse_id": i})
    return out


def parse_bible(content: str, url: str) -> list[dict]:
    """Dispatch on source format like driver_bible.py:37/51 (suffix)."""
    if url.endswith(".xml"):
        return parse_bible_xml(content)
    return parse_bible_txt(content)


def bible_rows(
    fetched: Iterable[tuple[str, str | None]]
) -> list[dict]:
    """Reference control flow (driver_bible.py:31-75): first source whose
    fetch succeeded AND parsed to rows wins; if none, the fallback
    sample. ``fetched`` = (url, content-or-None) pairs in priority
    order."""
    for url, content in fetched:
        if content is None:
            continue
        rows = parse_bible(content, url)
        if rows:
            return rows
    return list(BIBLE_FALLBACK_SAMPLE)


# --------------------------------------------------------------------------
# S6: HF dataset row mappers. A "dataset" here is the already-materialized
# mapping {split_name: [item, ...]} — exactly what load_dataset yields once
# iterated; mappers never touch the network.
# --------------------------------------------------------------------------

# config fallback order tried after the primary fails
# (driver_hf_tatoeba.py:44, driver_hf_americasnlp.py:44)
TATOEBA_CONFIGS: tuple[str, ...] = ("nah-es", "nah-spa", "nah_Latn-spa_Latn")
AMERICASNLP_CONFIGS: tuple[str, ...] = ("nahuatl", "nah", "all")
FLORES_CONFIGS: tuple[str, ...] = ("nah_Latn", "all")


def map_tatoeba_item(item: Mapping, split: str) -> dict | None:
    """Translation-pair detection across config variants
    (driver_hf_tatoeba.py:28-35,55-67): nah may arrive as ``nah`` or
    ``nah_Latn``, Spanish as ``es``/``spa``/``spa_Latn``; rows without a
    Nahuatl side are dropped."""
    trans = item.get("translation") or {}
    nah = trans.get("nah") or trans.get("nah_Latn") or ""
    es = trans.get("es") or trans.get("spa") or trans.get("spa_Latn") or ""
    if not nah:
        return None
    return {"nahuatl": nah, "spanish": es, "split": split}


def map_unimorph_item(item: Mapping, split: str) -> dict:
    """lemma / inflected form / morph tags (driver_hf_unimorph.py:27-35)."""
    return {
        "lemma": item.get("lemma", ""),
        "form": item.get("form", ""),
        "tags": item.get("tags", ""),
        "split": split,
    }


def map_flores_item(item: Mapping, split: str) -> dict:
    """FLORES sentence rows; only dev/devtest splits exist
    (driver_hf_flores.py:27-37)."""
    return {
        "nahuatl": item.get("sentence", ""),
        "spanish": item.get("sentence_es", ""),
        "split": split,
        "id": item.get("id", ""),
    }


def map_americasnlp_item(item: Mapping, split: str) -> dict:
    """text|source field fallback, target translation, task defaulting to
    'translation' (driver_hf_americasnlp.py:27-35)."""
    return {
        "nahuatl": item.get("text") or item.get("source") or "",
        "spanish": item.get("target", ""),
        "split": split,
        "task": item.get("task", "translation"),
    }


def rows_from_dataset(
    dataset: Mapping[str, Iterable[Mapping]],
    mapper: Callable[[Mapping, str], dict | None],
    splits: Sequence[str] | None = None,
) -> list[dict]:
    """Iterate {split: items} through a mapper, dropping None rows
    (the per-driver ``for split in dataset.keys()`` loops)."""
    out = []
    for split in (splits if splits is not None else dataset.keys()):
        if split not in dataset:
            continue
        for item in dataset[split]:
            row = mapper(item, split)
            if row is not None:
                out.append(row)
    return out


def load_first_config(
    load_fn: Callable[[str], Mapping[str, Iterable[Mapping]]],
    configs: Sequence[str],
    mapper: Callable[[Mapping, str], dict | None],
    splits: Sequence[str] | None = None,
) -> list[dict]:
    """Config-fallback control flow (driver_hf_tatoeba.py:41-75): try each
    dataset config in order; first one that loads AND maps to non-empty
    rows wins; empty list when all fail."""
    for cfg in configs:
        try:
            rows = rows_from_dataset(load_fn(cfg), mapper, splits)
        except Exception:
            continue
        if rows:
            return rows
    return []


# --------------------------------------------------------------------------
# Adapter: reference-shaped rows → engine LEGACY_INPUT_SCHEMA keys
# --------------------------------------------------------------------------

def to_legacy_row(row: Mapping) -> dict:
    """Map any parser output onto the legacy-coalescible keys consumed by
    ``legacy_coalesce`` (nah/es/source/category). Morphology rows carry
    lemma+tags in category; split survives in category for pair rows."""
    if "form" in row:  # unimorph morphology row
        return {
            "nah": row["form"],
            "es": row.get("lemma") or None,
            "source": "unimorph",
            "category": f"morphology:{row.get('tags', '')}",
        }
    nah = row.get("nahuatl") or row.get("text") or None
    return {
        "nah": nah,
        "es": row.get("spanish") or None,
        "source": row.get("source") or None,
        "category": row.get("split") or None,
    }


# --------------------------------------------------------------------------
# S8: PDF text extraction (driver_pdf_plumber — pipeline/ingestion/
# drivers.py:33-49 saves raw bytes; gemini_distiller.py:72-81 extracts
# per-page text with pdfplumber). pdfplumber isn't in this environment, so
# the built-in path is a minimal pure parser for the common case —
# uncompressed or FlateDecode content streams with standard-encoded
# string-show operators — and ``extract_fn`` plugs a real library in.
# --------------------------------------------------------------------------

_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_PDF_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_PDF_SHOW_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|'|\")|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ", re.DOTALL)
_PDF_TJ_PART_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")

_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt.isdigit():  # octal escape \ddd (1-3 digits)
            j = i + 1
            while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in _PDF_ESCAPES:
            out += _PDF_ESCAPES[nxt]
            i += 2
        else:  # unknown escape: PDF spec says drop the backslash
            out += nxt
            i += 2
    return bytes(out)


def extract_pdf_text(
    data: bytes,
    extract_fn: Callable[[bytes], str] | None = None,
) -> str:
    """bytes → extracted text (page/stream blocks joined with newlines,
    mirroring gemini_distiller.py:72-81's per-page join).

    ``extract_fn`` (e.g. pdfplumber-based) takes precedence when given;
    the built-in parser handles Flate/uncompressed content streams and
    ignores streams that are neither (images, fonts)."""
    if extract_fn is not None:
        return extract_fn(data)
    import zlib

    blocks: list[str] = []
    for m in _PDF_STREAM_RE.finditer(data):
        payload = m.group(1)
        try:
            payload = zlib.decompress(payload)
        except Exception:
            pass  # not Flate — try as-is
        shows: list[bytes] = []
        for bt in _PDF_TEXT_BLOCK_RE.finditer(payload):
            for sm in _PDF_SHOW_RE.finditer(bt.group(1)):
                if sm.group(1) is not None:
                    shows.append(_pdf_unescape(sm.group(1)))
                else:  # TJ array: concatenate its string parts
                    shows.append(
                        b"".join(
                            _pdf_unescape(p.group(1))
                            for p in _PDF_TJ_PART_RE.finditer(sm.group(2))
                        )
                    )
        if shows:
            blocks.append(
                b" ".join(shows).decode("latin-1", "replace")
            )
    return "\n".join(blocks)


def pdf_rows(data: bytes, extract_fn=None, min_len: int = 10) -> list[dict]:
    """PDF bytes → text rows (one per extracted line, min-length filtered
    like the bible driver's verse filter)."""
    out = []
    for i, line in enumerate(extract_pdf_text(data, extract_fn).split("\n")):
        line = line.strip()
        if len(line) > min_len:
            out.append({"text": line, "source": "pdf", "verse_id": i})
    return out


# --------------------------------------------------------------------------
# Harvest-driver response parsers. The reference's two LLM harvest loops
# interleave fetching (yt-dlp / Gemini calls, key rotation, worker pools)
# with parsing; the fetch/batch/retry machinery is the engine's generic
# operators/llm_stage.py (q48/q50), and these pure parsers are the
# response→row mappings those loops apply, testable on committed fixtures
# with no network.
# --------------------------------------------------------------------------

# youtube_harvester.py:131-144 — the structured-transcription contract the
# harvester requests from the model (per-phrase JSON objects with these
# exact keys; run_pipeline:173-189 writes them to JSONL with source_file).
YOUTUBE_TRANSCRIPT_KEYS = (
    "original_audio_text",
    "detected_language",
    "es_translation",
    "nah_translation",
)


def youtube_transcript_rows(
    payload: str | list | None, source_file: str
) -> list[dict]:
    """Model transcription response → harvest rows
    (youtube_harvester.py:150-189): parse the JSON payload, keep only a
    top-level LIST of objects (any other shape yields no rows, mirroring
    the ``isinstance(data, list)`` gate), attach ``source_file`` to each
    item. Rows keep whatever keys the model produced — downstream
    ``legacy_coalesce`` handles the detected_language→nah/myn routing
    (schemas.py:229-287), exactly as the reference feeds its JSONL into
    ``Record.from_legacy_format``."""
    import json as _json

    if isinstance(payload, str):
        try:
            payload = _json.loads(payload)
        except ValueError:
            return []
    if not isinstance(payload, list):
        return []
    out = []
    for item in payload:
        if not isinstance(item, dict):
            continue
        row = dict(item)
        row["source_file"] = source_file
        out.append(row)
    return out


# diamond_miner_v5.py:17-57 — per-language domain lists + row constants
# (data parity with the reference's LANG_CONFIG / mine_batch output shape).
DIAMOND_DOMAINS = {
    "nah": [
        "Medicina: Diagnóstico de diabetes y síntomas (Nahuatl)",
        "Legal: Derechos constitucionales en comunidades indígenas",
        "Cultura: Filosofía de la dualidad (Ometeotl)",
        "Dialecto: Variantes de la Huasteca Hidalguense",
        "Gramática: Uso del reverencial (-tzin)",
        "Vida Diaria: Mercado y regateo",
    ],
    "myn": [
        "Meliponicultura: Abejas Xunaan Kab y floración",
        "Geología: Cenotes, suelo k'ankab y selva baja",
        "Medicina Maya: J-Men, hierbabuena y ruda",
        "Matemáticas: Sistema vigesimal y cuentas lunares",
        "Gramática: Estructura VOS (Verbo-Objeto-Sujeto)",
        "Vida Diaria: Vaquería y jarana",
    ],
}


def diamond_worker_lang(worker_id: int) -> str:
    """Worker→language interleave (diamond_miner_v5.py:110): even ids
    mine Náhuatl, odd ids Maya."""
    return "nah" if worker_id % 2 == 0 else "myn"


def parse_teacher_seed(text: str | None) -> tuple[str, str] | None:
    """Teacher (seed) response: ``SPANISH|TARGET`` pipe format
    (diamond_miner_v5.py:63-81) — strip, split on '|', need ≥2 parts,
    first two win; anything else is a discarded batch (None)."""
    if not text:
        return None
    parts = text.strip().split("|")
    if len(parts) >= 2:
        return (parts[0], parts[1])
    return None


def parse_student_variations(payload: str | list | None) -> list[dict]:
    """Student (variation) response: JSON array of ``{"es", "target"}``
    objects (diamond_miner_v5.py:84-105); malformed JSON or a non-list
    yields [] (the reference's except-return-[])."""
    import json as _json

    if isinstance(payload, str):
        try:
            payload = _json.loads(payload)
        except ValueError:
            return []
    if not isinstance(payload, list):
        return []
    return [v for v in payload if isinstance(v, dict)]


def diamond_rows(
    lang: str,
    domain: str,
    teacher_text: str | None,
    student_payload: str | list | None,
) -> list[dict]:
    """One mined batch → gold rows (diamond_miner_v5.py:108-148): the
    stripped teacher seed (source Gemini-3-Pro, type seed_phd) followed
    by every variation carrying BOTH ``es`` and ``target`` keys (source
    Gemini-3-Flash, type augmentation). A failed teacher parse discards
    the whole batch, variations included — the reference returns []
    before ever calling the student."""
    seed = parse_teacher_seed(teacher_text)
    if seed is None:
        return []
    es_seed, target_seed = seed
    rows = [{
        "es": es_seed.strip(),
        "target": target_seed.strip(),
        "lang": lang,
        "source": "Gemini-3-Pro",
        "domain": domain,
        "type": "seed_phd",
    }]
    for v in parse_student_variations(student_payload):
        if "es" in v and "target" in v:
            rows.append({
                "es": v["es"],
                "target": v["target"],
                "lang": lang,
                "source": "Gemini-3-Flash",
                "domain": domain,
                "type": "augmentation",
            })
    return rows
