"""Pluggable ingestion-driver registry (S6-S8, SURVEY.md §2.1; reference
``pipeline/ingestion/drivers.py:12-31,72-76`` — a dict of
``driver_name → ingest(source_url)`` functions dispatched per source row).

Drivers fetch EXTERNAL data (HuggingFace datasets, HTTP corpora, PDFs) on
the driver process and hand Spark a row iterable + schema — ingestion
becomes ``spark.createDataFrame(rows, CORPUS-shaped schema)`` and every
downstream operator is ordinary engine code. Network fetchers are gated
behind import-try (none of hf-datasets/requests ship in this
environment); the registry mechanics, dispatch, Bronze tagging, and
error isolation are the tested surface.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# driver: source_url -> iterable of dicts with any legacy-coalescible keys
IngestFn = Callable[[str], Iterable[dict]]

DRIVER_REGISTRY: dict[str, IngestFn] = {}


def register_driver(name: str) -> Callable[[IngestFn], IngestFn]:
    """Decorator: add an ingest function to the dispatch table
    (drivers.py:72-76 dict pattern)."""

    def deco(fn: IngestFn) -> IngestFn:
        DRIVER_REGISTRY[name] = fn
        return fn

    return deco


def ingest_source(
    spark: SparkSession,
    driver: str,
    source_url: str,
    source_id: str | None = None,
) -> DataFrame:
    """Run one driver and land its rows as a Bronze-tagged DataFrame with
    lineage columns (origin_file = the source url, layer = bronze)."""
    from nahuatl_data_pipeline_spark.schemas import LEGACY_INPUT_SCHEMA
    from nahuatl_data_pipeline_spark.sources.readers import legacy_coalesce

    if driver not in DRIVER_REGISTRY:
        raise KeyError(
            f"unknown driver {driver!r}; registered: {sorted(DRIVER_REGISTRY)}"
        )
    rows = list(DRIVER_REGISTRY[driver](source_url))
    field_names = [f.name for f in LEGACY_INPUT_SCHEMA.fields]
    tuples = [tuple(r.get(k) for k in field_names) for r in rows]
    raw = spark.createDataFrame(tuples, LEGACY_INPUT_SCHEMA)
    return (
        legacy_coalesce(raw)
        .withColumn("origin_file", F.lit(source_url))
        .withColumn("layer", F.lit("bronze"))
        .withColumn("source_id", F.lit(source_id))
    )


def ingest_pending(
    spark: SparkSession, registry: DataFrame
) -> tuple[DataFrame | None, list[str], list[str]]:
    """Dispatch every Pending registry row to its driver (discovery.py +
    manager.py loop). Per-source failures are isolated — one bad feed
    never kills the batch. Returns (union of ingested frames | None,
    succeeded ids, failed ids)."""
    from nahuatl_data_pipeline_spark.sources.registry import pending_source_rows

    done: list[str] = []
    failed: list[str] = []
    frames: list[DataFrame] = []
    for row in pending_source_rows(registry).collect():
        try:
            frames.append(
                ingest_source(
                    spark,
                    row["ingestion_driver"],
                    row["source_url"],
                    source_id=row["source_id"],
                )
            )
            done.append(row["source_id"])
        except Exception:
            failed.append(row["source_id"])
    if not frames:
        return None, done, failed
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out, done, failed


# --- reference drivers, network parts gated behind import-try --------------


@register_driver("synthetic")
def driver_synthetic(source_url: str) -> Iterable[dict]:
    """M6 synthetic generation (generate_synthetic_data.py): deterministic
    seed-vocab × template expansion, no network."""
    vocab = [("agua", "atl"), ("casa", "calli"), ("flor", "xochitl")]
    templates = ["la {es} es bonita|in {nah} cualli", "{es} grande|huēyi {nah}"]
    for es_w, nah_w in vocab:
        for t in templates:
            es_t, nah_t = t.split("|")
            yield {
                "es": es_t.format(es=es_w, nah=nah_w),
                "nah": nah_t.format(es=es_w, nah=nah_w),
                "source": "synthetic",
            }


def _fetch_url(url: str, timeout: int = 30) -> str | None:
    """The ONLY network touchpoint for HTTP drivers; returns None on any
    failure (driver_bible.py:33-66 continues to the next source)."""
    try:  # pragma: no cover - no network in this environment
        import urllib.request

        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.read().decode("utf-8", "replace")
    except Exception:
        return None


def _load_hf_dataset(source_url: str, config: str) -> dict:
    """Gated HF fetch: materialize load_dataset output into the plain
    {split: [item, ...]} mapping the pure mappers consume."""
    try:
        from datasets import load_dataset  # type: ignore
    except ImportError as exc:  # pragma: no cover - env without datasets
        raise RuntimeError("hf datasets library not installed") from exc
    ds = load_dataset(source_url, config)  # pragma: no cover
    return {s: [dict(r) for r in ds[s]] for s in ds.keys()}  # pragma: no cover


@register_driver("hf_generic")
def driver_hf_generic(source_url: str) -> Iterable[dict]:
    """S6 HuggingFace driver (driver_hf_*.py): requires the datasets
    library — unavailable here, so this raises cleanly and
    ingest_pending isolates the failure."""
    try:
        from datasets import load_dataset  # type: ignore
    except ImportError as exc:  # pragma: no cover - env without datasets
        raise RuntimeError("hf datasets library not installed") from exc
    ds = load_dataset(source_url, split="train")  # pragma: no cover
    for r in ds:  # pragma: no cover
        yield dict(r)


@register_driver("hf_tatoeba")
def driver_hf_tatoeba(source_url: str) -> Iterable[dict]:
    """S6 Tatoeba pairs (driver_hf_tatoeba.py:9-79): config fallback
    nah-es → nah-spa → nah_Latn-spa_Latn, translation-key detection.
    Fetch gated; parse/mapping logic lives network-free in parsers.py."""
    from nahuatl_data_pipeline_spark.sources.parsers import (
        TATOEBA_CONFIGS,
        load_first_config,
        map_tatoeba_item,
        to_legacy_row,
    )

    rows = load_first_config(
        lambda cfg: _load_hf_dataset(source_url, cfg),
        TATOEBA_CONFIGS,
        map_tatoeba_item,
    )
    if not rows:
        raise RuntimeError(f"no tatoeba config loaded for {source_url}")
    return [to_legacy_row(r) for r in rows]


@register_driver("hf_unimorph")
def driver_hf_unimorph(source_url: str) -> Iterable[dict]:
    """S6 UniMorph morphology (driver_hf_unimorph.py:9-41)."""
    from nahuatl_data_pipeline_spark.sources.parsers import (
        map_unimorph_item,
        rows_from_dataset,
        to_legacy_row,
    )

    ds = _load_hf_dataset(source_url, "default")
    return [to_legacy_row(r) for r in rows_from_dataset(ds, map_unimorph_item)]


@register_driver("hf_flores")
def driver_hf_flores(source_url: str) -> Iterable[dict]:
    """S6 FLORES-200 (driver_hf_flores.py:9-40): dev/devtest splits only."""
    from nahuatl_data_pipeline_spark.sources.parsers import (
        FLORES_CONFIGS,
        load_first_config,
        map_flores_item,
        to_legacy_row,
    )

    rows = load_first_config(
        lambda cfg: _load_hf_dataset(source_url, cfg),
        FLORES_CONFIGS,
        map_flores_item,
        splits=("dev", "devtest"),
    )
    if not rows:
        raise RuntimeError(f"no flores config loaded for {source_url}")
    return [to_legacy_row(r) for r in rows]


@register_driver("hf_americasnlp")
def driver_hf_americasnlp(source_url: str) -> Iterable[dict]:
    """S6 AmericasNLP (driver_hf_americasnlp.py:9-70): config fallback
    nahuatl → nah → all, text|source field fallback."""
    from nahuatl_data_pipeline_spark.sources.parsers import (
        AMERICASNLP_CONFIGS,
        load_first_config,
        map_americasnlp_item,
        to_legacy_row,
    )

    rows = load_first_config(
        lambda cfg: _load_hf_dataset(source_url, cfg),
        AMERICASNLP_CONFIGS,
        map_americasnlp_item,
    )
    if not rows:
        raise RuntimeError(f"no americasnlp config loaded for {source_url}")
    return [to_legacy_row(r) for r in rows]


@register_driver("pdf_text")
def driver_pdf_text(source_url: str) -> Iterable[dict]:
    """S8 PDF driver (pipeline/ingestion/drivers.py:33-49 +
    gemini_distiller.py:72-81): read local PDF bytes, extract text rows.
    The built-in pure parser handles Flate/uncompressed text streams;
    a pdfplumber-style ``extract_fn`` can be wired through
    ``parsers.pdf_rows`` for everything else."""
    from nahuatl_data_pipeline_spark.sources.parsers import (
        pdf_rows,
        to_legacy_row,
    )

    path = source_url.removeprefix("file://")
    with open(path, "rb") as f:
        data = f.read()
    return [to_legacy_row(r) for r in pdf_rows(data)]


# priority-ordered public bible mirrors (driver_bible.py:23-27)
BIBLE_SOURCE_URLS: tuple[str, ...] = (
    "https://raw.githubusercontent.com/BibleNLP/ebible/main/corpus/nah-x-bible.txt",
    "https://raw.githubusercontent.com/christos-c/bible-corpus/master/bibles/Nahuatl.xml",
)


@register_driver("http_verse")
def driver_http_verse(source_url: str) -> Iterable[dict]:
    """S7 HTTP/Bible driver (driver_bible.py:10-80): try each mirror in
    order, parse txt-lines or <verse> XML (parsers.py), fall back to the
    reference's sample verses when nothing is reachable — the driver
    always yields rows, like the reference."""
    from nahuatl_data_pipeline_spark.sources.parsers import (
        bible_rows,
        to_legacy_row,
    )

    urls = (source_url,) if source_url.startswith("http") else BIBLE_SOURCE_URLS
    fetched = ((u, _fetch_url(u)) for u in urls)
    return [to_legacy_row(r) for r in bible_rows(fetched)]
