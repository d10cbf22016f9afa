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
