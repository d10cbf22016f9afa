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


if __name__ == "__main__":
    psl_probe(
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf3m",
        int(sys.argv[3]) if len(sys.argv) > 3 else 2,
    )
