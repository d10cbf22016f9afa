"""Round-13 probe: url_domain_psl at the REAL public-suffix rule count
(round-12 verdict #2 — q171 certifies the ALGORITHM on a 7-rule
literal; SCALE.md's "~9k rules still broadcast fine" was an argument,
not a measurement).

Measures, over the native-url mixed replica at a decade factor:

- wall for registered-domain stats (groupBy(domain).agg) through the
  LITERAL-tuple ``url_domain`` (baseline) and through
  ``url_domain_psl`` under the committed 9.2k-rule snapshot
  (tests/fixtures/public_suffix_snapshot.dat), repeat-N with [min,max]
  bands and md5 host-calibration brackets (bench.py helpers);
- the PSL rule-table payload: per-(kind, label-count) frame row counts
  and UTF-8 bytes — what actually broadcasts;
- the zero-exchange contract at scale: the PSL plan must contain
  EXACTLY as many shuffle exchanges as the literal plan (the one the
  final groupBy owns) and at least one BroadcastHashJoin per rule
  frame.

Usage:
  python tools/scale_round13.py psl /tmp/scale_sf3m [repeat]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F

from bench import _calibration_probe, _merge_calibration
from nahuatl_data_pipeline_spark.functions.url import (
    canonicalize_url,
    load_public_suffix_list,
    url_domain,
    url_domain_psl,
)
from nahuatl_data_pipeline_spark.session import get_spark

SNAPSHOT = os.path.join(
    _ROOT, "tests", "fixtures", "public_suffix_snapshot.dat"
)


def psl_probe(sf_dir: str, repeat: int = 2) -> None:
    rules = load_public_suffix_list(SNAPSHOT)
    by_len: dict[str, dict[int, int]] = {}
    payload = 0
    n_rules = 0
    for kind, rs in rules.items():
        for r in rs:
            k = r.count(".") + 1
            by_len.setdefault(kind, {})[k] = (
                by_len.get(kind, {}).get(k, 0) + 1
            )
            payload += len(r.encode("utf-8"))
            n_rules += 1

    spark = get_spark(app_name="nahuatl-scale-round13-psl")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = docs.select(
        "doc_id", canonicalize_url(F.col("url")).alias("canon")
    )
    n_rows = base.count()  # warm JVM + parquet footers

    def stats(df):
        return df.groupBy("domain").agg(
            F.count(F.lit(1)).alias("n_docs")
        ).agg(
            F.count(F.lit(1)).alias("n_domains"),
            F.max("n_docs").alias("max_docs"),
        )

    literal = stats(
        base.select(url_domain(F.col("canon")).alias("domain"))
    )
    psl = stats(
        url_domain_psl(base, "canon", rules, out_col="domain").select(
            "domain"
        )
    )
    lit_plan = literal._jdf.queryExecution().executedPlan().toString()
    psl_plan = psl._jdf.queryExecution().executedPlan().toString()
    n_ex_lit = lit_plan.count("Exchange hashpartitioning")
    n_ex_psl = psl_plan.count("Exchange hashpartitioning")
    assert n_ex_psl == n_ex_lit, (n_ex_psl, n_ex_lit)
    n_bcast = psl_plan.count("BroadcastHashJoin")
    n_frames = sum(len(v) for v in by_len.values())
    assert n_bcast >= n_frames, (n_bcast, n_frames)

    # rebuild the frames per iteration: collecting the SAME DataFrame
    # object twice lets Spark reuse its shuffle output (stage skip) and
    # the repeat would measure nothing
    def build(name):
        if name == "literal":
            return stats(
                base.select(url_domain(F.col("canon")).alias("domain"))
            )
        return stats(
            url_domain_psl(
                base, "canon", rules, out_col="domain"
            ).select("domain")
        )

    cal_start = _calibration_probe()
    walls: dict[str, list[float]] = {"literal": [], "psl": []}
    results: dict[str, list] = {}
    for _ in range(repeat):
        for name in ("literal", "psl"):
            df = build(name)
            t0 = time.perf_counter()
            results[name] = [tuple(r) for r in df.collect()]
            walls[name].append(round(time.perf_counter() - t0, 2))
    cal = _merge_calibration(cal_start, _calibration_probe())
    print(
        json.dumps(
            {
                "probe": "psl_decade",
                "sf_dir": sf_dir,
                "rows": n_rows,
                "n_rules": n_rules,
                "rule_frames": {
                    k: dict(sorted(v.items())) for k, v in by_len.items()
                },
                "rule_payload_bytes": payload,
                "exchanges": {"literal": n_ex_lit, "psl": n_ex_psl},
                "broadcast_joins": n_bcast,
                "bands": {
                    k: [min(v), max(v)] for k, v in walls.items()
                },
                "result": {k: v for k, v in results.items()},
                "cal": cal,
            },
            separators=(",", ":"),
            default=str,
        )
    )


def stream_probe(
    sf_dir: str, n_files: int = 16, files_per_trigger: int = 2
) -> None:
    """Decade throughput/state probe for ``streaming_url_dedup``.

    Stages the replica's documents as ``n_files`` parquet files and
    replays them as a file-source stream (``maxFilesPerTrigger`` →
    multiple micro-batches, the incremental-crawl arrival shape), with
    the q158-canonical dedup as ``dropDuplicatesWithinWatermark``. A
    deterministic event time is synthesized from doc_id (no wall-clock
    in the data). The watermark delay (25 h) exceeds the synthesized
    <24 h ts span, so no state is evicted mid-run and the stream's
    output must equal batch ``url_dedup`` exactly — counted from the
    parquet sink, not trusted from progress events. Reports wall,
    rows/s, micro-batch count, peak state rows/bytes (the 100 TB
    argument: state = one row per canonical key inside the watermark
    horizon, never the corpus), plus md5 calibration brackets.

    Usage: python tools/scale_round13.py stream /tmp/scale_sf3m [n_files]
    """
    import shutil
    import tempfile

    from nahuatl_data_pipeline_spark.functions.url import url_dedup
    from nahuatl_data_pipeline_spark.streaming.incremental import (
        streaming_url_dedup,
    )

    spark = get_spark(app_name="nahuatl-scale-round13-stream")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_url_", dir="/tmp")
    src, sink, ckpt = (os.path.join(work, d) for d in ("src", "out", "ckpt"))

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if "url" not in docs.columns:
        # base testdata has no native url column (only --mixed replicas
        # do) — fall back to the q158 synthetic crawl table so the
        # probe also runs at smoke scale
        from nahuatl_data_pipeline_spark.registry_round9 import _url_table

        docs = _url_table(spark, sf_dir)
    staged = docs.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1735689600) + F.col("doc_id") % 86400  # 2025-01-01 + <24h
        ),
    )
    staged.repartition(n_files).write.mode("overwrite").parquet(src)
    n_rows = spark.read.parquet(src).count()
    batch_out = url_dedup(spark.read.parquet(src)).count()

    cal_start = _calibration_probe()
    t0 = time.perf_counter()
    stream = (
        spark.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    q = (
        streaming_url_dedup(stream, watermark="25 hours")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    progress = [json.loads(p.json) for p in q.recentProgress]
    cal = _merge_calibration(cal_start, _calibration_probe())

    stream_out = spark.read.parquet(sink).count()
    state_rows = [
        s["numRowsTotal"] for p in progress for s in p.get("stateOperators", [])
    ]
    state_bytes = [
        s["memoryUsedBytes"]
        for p in progress
        for s in p.get("stateOperators", [])
    ]
    print(
        json.dumps(
            {
                "probe": "stream_url_dedup_decade",
                "sf_dir": sf_dir,
                "input_rows": n_rows,
                "batch_out": batch_out,
                "stream_out": stream_out,
                "exact_match": stream_out == batch_out,
                "micro_batches": len(progress),
                "wall_s": wall,
                "rows_per_s": round(n_rows / wall, 1),
                "peak_state_rows": max(state_rows, default=0),
                "peak_state_bytes": max(state_bytes, default=0),
                "cal": cal,
            },
            separators=(",", ":"),
            default=str,
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "psl"
    if mode == "stream":
        stream_probe(
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf3m",
            int(sys.argv[3]) if len(sys.argv) > 3 else 16,
            int(sys.argv[4]) if len(sys.argv) > 4 else 2,
        )
    else:
        psl_probe(
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf3m",
            int(sys.argv[3]) if len(sys.argv) > 3 else 2,
        )
