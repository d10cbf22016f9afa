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


@register_driver("http_verse")
def driver_http_verse(source_url: str) -> Iterable[dict]:
    """S7 HTTP/Bible driver (driver_bible.py:10-80): fetch + regex-parse
    <verse> elements; min-length filter. Network-gated."""
    try:
        import urllib.request

        with urllib.request.urlopen(source_url, timeout=10) as r:  # pragma: no cover
            body = r.read().decode("utf-8", "replace")
    except Exception as exc:
        raise RuntimeError(f"fetch failed: {source_url}") from exc
    import re  # pragma: no cover

    for m in re.finditer(r"<verse[^>]*>(.*?)</verse>", body, re.S):  # pragma: no cover
        text = m.group(1).strip()
        if len(text) > 10:
            yield {"nah": text, "source": "bible"}
