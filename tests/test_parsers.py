"""Pure ingestion parsers on local fixtures — the per-dataset mapping
logic the reference buries inside network calls (driver_bible.py,
driver_hf_*.py), here testable offline."""

from __future__ import annotations

from nahuatl_data_pipeline_spark.sources.parsers import (
    AMERICASNLP_CONFIGS,
    BIBLE_FALLBACK_SAMPLE,
    TATOEBA_CONFIGS,
    bible_rows,
    load_first_config,
    map_americasnlp_item,
    map_flores_item,
    map_tatoeba_item,
    map_unimorph_item,
    parse_bible_txt,
    parse_bible_xml,
    rows_from_dataset,
    to_legacy_row,
)

BIBLE_TXT = """In ipan pehuallotl, Dios quichiuh ilhuicatl ihuan tlaltipactli.

short
Ihuan Dios quitoh: Machihua tlanextli, ihuan omochiuh tlanextli.
"""

BIBLE_XML = """<?xml version="1.0"?>
<bible>
  <verse id="GEN.1.1">In ipan pehuallotl, <em>Dios</em> quichiuh
  ilhuicatl.</verse>
  <verse id="GEN.1.2">x</verse>
  <verse id="GEN.1.3">Ihuan Dios quitoh: Machihua tlanextli.</verse>
</bible>
"""


def test_parse_bible_txt_min_length_and_original_line_numbers():
    rows = parse_bible_txt(BIBLE_TXT)
    # 'short' (5 chars) and the blank line are dropped; verse_id keeps the
    # ORIGINAL line number, mirroring the reference's enumerate-then-filter
    assert [r["verse_id"] for r in rows] == [0, 3]
    assert all(r["source"] == "bible" for r in rows)
    assert rows[0]["text"].startswith("In ipan pehuallotl")


def test_parse_bible_xml_strips_inner_tags_and_joins_lines():
    rows = parse_bible_xml(BIBLE_XML)
    assert len(rows) == 2  # the 1-char verse is filtered
    assert "<em>" not in rows[0]["text"] and "Dios" in rows[0]["text"]
    assert rows[1]["text"] == "Ihuan Dios quitoh: Machihua tlanextli."


def test_bible_rows_first_successful_source_wins():
    fetched = [
        ("https://x/dead.txt", None),  # fetch failed
        ("https://x/bible.xml", BIBLE_XML),
        ("https://x/bible.txt", BIBLE_TXT),  # never reached
    ]
    rows = bible_rows(fetched)
    assert len(rows) == 2 and rows[0]["text"].startswith("In ipan")


def test_bible_rows_falls_back_to_sample():
    assert bible_rows([("https://x/a.txt", None)]) == BIBLE_FALLBACK_SAMPLE


def test_tatoeba_primary_and_latn_key_variants():
    primary = map_tatoeba_item(
        {"translation": {"nah": "niltze", "es": "hola"}}, "train"
    )
    assert primary == {"nahuatl": "niltze", "spanish": "hola", "split": "train"}
    latn = map_tatoeba_item(
        {"translation": {"nah_Latn": "niltze", "spa_Latn": "hola"}}, "test"
    )
    assert latn["nahuatl"] == "niltze" and latn["spanish"] == "hola"
    # rows without a nahuatl side are dropped
    assert map_tatoeba_item({"translation": {"es": "hola"}}, "train") is None
    assert map_tatoeba_item({}, "train") is None


def test_tatoeba_config_fallback_order():
    calls = []

    def load(cfg):
        calls.append(cfg)
        if cfg != "nah_Latn-spa_Latn":
            raise ValueError("config unavailable")
        return {"train": [{"translation": {"nah_Latn": "n", "spa_Latn": "e"}}]}

    rows = load_first_config(load, TATOEBA_CONFIGS, map_tatoeba_item)
    assert calls == list(TATOEBA_CONFIGS)
    assert rows == [{"nahuatl": "n", "spanish": "e", "split": "train"}]


def test_config_fallback_skips_empty_datasets():
    def load(cfg):
        if cfg == "nahuatl":
            return {"train": []}  # loads but maps to nothing
        return {"train": [{"text": "tlen", "target": "qué"}]}

    rows = load_first_config(load, AMERICASNLP_CONFIGS, map_americasnlp_item)
    assert rows and rows[0]["nahuatl"] == "tlen"


def test_config_fallback_all_fail_returns_empty():
    def load(cfg):
        raise OSError("offline")

    assert load_first_config(load, TATOEBA_CONFIGS, map_tatoeba_item) == []


def test_unimorph_mapping():
    row = map_unimorph_item(
        {"lemma": "cua", "form": "nitlacua", "tags": "V;PRS;1;SG"}, "train"
    )
    assert row == {
        "lemma": "cua", "form": "nitlacua", "tags": "V;PRS;1;SG",
        "split": "train",
    }


def test_flores_dev_splits_only():
    ds = {
        "dev": [{"sentence": "se", "sentence_es": "uno", "id": 7}],
        "train": [{"sentence": "nope"}],
    }
    rows = rows_from_dataset(ds, map_flores_item, splits=("dev", "devtest"))
    assert rows == [
        {"nahuatl": "se", "spanish": "uno", "split": "dev", "id": 7}
    ]


def test_americasnlp_text_source_fallback_and_task_default():
    a = map_americasnlp_item({"text": "t1", "target": "e1"}, "train")
    b = map_americasnlp_item({"source": "t2", "task": "asr"}, "dev")
    assert a["nahuatl"] == "t1" and a["task"] == "translation"
    assert b["nahuatl"] == "t2" and b["task"] == "asr"


def test_to_legacy_row_shapes():
    assert to_legacy_row({"nahuatl": "n", "spanish": "e", "split": "train"}) == {
        "nah": "n", "es": "e", "source": None, "category": "train"
    }
    assert to_legacy_row({"text": "v", "source": "bible", "verse_id": 3}) == {
        "nah": "v", "es": None, "source": "bible", "category": None
    }
    morph = to_legacy_row(
        {"lemma": "cua", "form": "nitlacua", "tags": "V;PRS", "split": "train"}
    )
    assert morph == {
        "nah": "nitlacua", "es": "cua", "source": "unimorph",
        "category": "morphology:V;PRS",
    }


def _minimal_pdf(*stream_payloads: bytes) -> bytes:
    """Assemble a minimal but structurally honest PDF: header, one
    content-stream object per payload, EOF."""
    parts = [b"%PDF-1.4\n"]
    for i, payload in enumerate(stream_payloads):
        parts.append(
            b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (i + 1, len(payload), payload)
        )
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def test_pdf_extract_uncompressed_tj_and_TJ():
    from nahuatl_data_pipeline_spark.sources.parsers import extract_pdf_text

    content = (b"BT /F1 12 Tf (Hola \\(mundo\\) de prueba) Tj "
               b"[(in tlahtolli) ( melahuac)] TJ ET")
    text = extract_pdf_text(_minimal_pdf(content))
    assert "Hola (mundo) de prueba" in text
    assert "in tlahtolli melahuac" in text


def test_pdf_extract_flate_stream_and_octal_escape():
    import zlib

    from nahuatl_data_pipeline_spark.sources.parsers import extract_pdf_text

    content = zlib.compress(b"BT (\\110ola comprimida de verdad) Tj ET")
    text = extract_pdf_text(_minimal_pdf(content))
    assert "Hola comprimida de verdad" in text  # \110 octal = 'H'


def test_pdf_extract_ignores_binary_streams_and_uses_plugin():
    from nahuatl_data_pipeline_spark.sources.parsers import extract_pdf_text

    pdf = _minimal_pdf(b"\x00\x01binary image bytes no BT",
                       b"BT (texto real en el pdf) Tj ET")
    assert extract_pdf_text(pdf) == "texto real en el pdf"
    # plug-in path takes precedence entirely
    assert extract_pdf_text(pdf, extract_fn=lambda b: "plumber!") == "plumber!"


def test_pdf_driver_rows(spark, tmp_path):
    import zlib

    from nahuatl_data_pipeline_spark.sources.drivers import ingest_source

    payload = zlib.compress(
        b"BT (In ipan tlahtolli melahuac ticpiah) Tj ET\n"
        b"BT (ocachi tlahtolli ipan ome amatl) Tj ET"
    )
    p = tmp_path / "doc.pdf"
    p.write_bytes(_minimal_pdf(payload))
    df = ingest_source(spark, "pdf_text", str(p), "s8")
    rows = df.collect()
    assert len(rows) == 1  # one stream → one joined block row
    assert "tlahtolli" in rows[0]["nah"]
    assert rows[0]["layer"] == "bronze" and rows[0]["source_id"] == "s8"


def test_http_verse_driver_offline_yields_fallback_sample(spark):
    from nahuatl_data_pipeline_spark.sources.drivers import ingest_source

    df = ingest_source(spark, "http_verse", "bible-nahuatl-central", "s9")
    rows = df.collect()
    assert len(rows) == len(BIBLE_FALLBACK_SAMPLE)
    assert all(r["layer"] == "bronze" and r["source_id"] == "s9" for r in rows)
    assert any("pehuallotl" in r["nah"] for r in rows)


# --------------------------------------------------------------------------
# Harvest-driver response parsers (youtube_harvester.py / diamond_miner_v5.py)
# --------------------------------------------------------------------------

_FIXTURES = __import__("pathlib").Path(__file__).parent / "fixtures"


def test_youtube_transcript_rows_fixture():
    from nahuatl_data_pipeline_spark.sources.parsers import (
        YOUTUBE_TRANSCRIPT_KEYS,
        youtube_transcript_rows,
    )

    payload = (_FIXTURES / "youtube_transcript_response.json").read_text(
        encoding="utf-8"
    )
    rows = youtube_transcript_rows(payload, "abc123.mp3")
    assert len(rows) == 3  # stray string item skipped
    assert all(r["source_file"] == "abc123.mp3" for r in rows)
    assert all(set(YOUTUBE_TRANSCRIPT_KEYS) <= set(r) for r in rows)
    assert {r["detected_language"] for r in rows} == {"nah", "myn", "es"}


def test_youtube_transcript_rows_rejects_non_list_shapes():
    from nahuatl_data_pipeline_spark.sources.parsers import (
        youtube_transcript_rows,
    )

    assert youtube_transcript_rows('{"not": "a list"}', "f.mp3") == []
    assert youtube_transcript_rows("not json at all", "f.mp3") == []
    assert youtube_transcript_rows(None, "f.mp3") == []


def test_youtube_rows_route_through_legacy_coalesce(spark):
    """The harvest JSONL feeds Record.from_legacy_format in the reference
    (schemas.py:229-287): detected_language routes original_audio_text
    into nah/myn, es comes from es_translation."""
    from nahuatl_data_pipeline_spark.sources.parsers import (
        youtube_transcript_rows,
    )
    from nahuatl_data_pipeline_spark.sources.readers import legacy_coalesce

    payload = (_FIXTURES / "youtube_transcript_response.json").read_text(
        encoding="utf-8"
    )
    rows = youtube_transcript_rows(payload, "vid.mp3")
    df = spark.createDataFrame(
        [tuple(r[k] for k in sorted(r)) for r in rows],
        sorted(rows[0]),
    )
    got = legacy_coalesce(df).collect()
    by_es = {r["es"]: r for r in got}
    assert by_es["Hola, ¿cómo estás en este día?"]["nah"].startswith("Niltze")
    assert by_es["¿Cómo estás, compañero?"]["myn"].startswith("Bix a beel")
    assert all(r["origin_file"] == "vid.mp3" for r in got)


def test_parse_teacher_seed_pipe_format():
    from nahuatl_data_pipeline_spark.sources.parsers import parse_teacher_seed

    assert parse_teacher_seed("Hola | Niltze") == ("Hola ", " Niltze")
    assert parse_teacher_seed("  a|b|extra  ") == ("a", "b")
    assert parse_teacher_seed("no pipe here") is None
    assert parse_teacher_seed("") is None
    assert parse_teacher_seed(None) is None


def test_diamond_rows_fixture():
    from nahuatl_data_pipeline_spark.sources.parsers import (
        DIAMOND_DOMAINS,
        diamond_rows,
        diamond_worker_lang,
    )

    assert diamond_worker_lang(0) == "nah" and diamond_worker_lang(3) == "myn"
    student = (_FIXTURES / "diamond_student_response.json").read_text(
        encoding="utf-8"
    )
    domain = DIAMOND_DOMAINS["nah"][0]
    rows = diamond_rows("nah", domain, " Frase médica | Tlahtolli pahtli ",
                        student)
    assert len(rows) == 3  # seed + 2 valid variations (2 dropped)
    seed = rows[0]
    assert seed["type"] == "seed_phd" and seed["source"] == "Gemini-3-Pro"
    assert seed["es"] == "Frase médica" and seed["target"] == "Tlahtolli pahtli"
    assert all(
        r["type"] == "augmentation" and r["source"] == "Gemini-3-Flash"
        for r in rows[1:]
    )
    assert all(r["lang"] == "nah" and r["domain"] == domain for r in rows)


def test_diamond_rows_failed_teacher_discards_batch():
    from nahuatl_data_pipeline_spark.sources.parsers import diamond_rows

    assert diamond_rows("myn", "d", "no pipe", '[{"es":"x","target":"y"}]') == []
    assert diamond_rows("myn", "d", None, "[]") == []


def test_parse_student_variations_malformed():
    from nahuatl_data_pipeline_spark.sources.parsers import (
        parse_student_variations,
    )

    assert parse_student_variations("{bad json") == []
    assert parse_student_variations('{"a": 1}') == []
    assert parse_student_variations(None) == []
    assert parse_student_variations('[{"es": "a", "target": "b"}, 7]') == [
        {"es": "a", "target": "b"}
    ]
