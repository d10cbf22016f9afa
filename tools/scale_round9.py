"""Round-9 probes.

1) ``pmi``: the q118 ``max_vocab`` lever under an OPEN vocabulary.
   The synthetic corpus (even the unique-text replicas) has a tiny
   closed vocabulary (~31 common + 1 salt token per replica), so the
   top-df cap never binds there. This probe plants 3 per-doc-unique
   tokens (md5-derived) on the 100x-unique replica — the real failure
   shape at 100 TB: rare terms inflate per-doc distinct-token count d,
   pair fan-out Σ C(d,2) grows, and (worse) rare-term pairs are UNIQUE
   keys, so map-side combine cannot shrink the pair shuffle. Reports
   wall + the exact planned pair volume (Σ C(d,2)) for capped vs
   uncapped.

2) ``q138``: repeated solo measurement of q138 at sf0.1 (the only
   >1.5x round-8 bench regression, with no q138 code change — verdict
   asks load-drift vs real).

Usage:
  python tools/scale_round9.py pmi  /tmp/scale_sf10u
  python tools/scale_round9.py q138 /root/testdata/sf0.1 5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.schemas import load_table
from nahuatl_data_pipeline_spark.session import get_spark


_N_UNIQUE = 8


def _open_vocab_docs(spark, sf_dir):
    """documents + 8 per-doc-unique tokens (md5-derived, deterministic)
    — the open-web tail: IDs, typos, hashes, rare names."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 10)
    parts = [F.col("text")]
    for i in range(_N_UNIQUE):
        parts += [F.lit(f" z{i}x"), h]
    return docs.select("doc_id", F.concat(*parts).alias("text"))


def pmi_probe(sf_dir: str) -> None:
    from nahuatl_data_pipeline_spark.functions.hashing import token_set
    from nahuatl_data_pipeline_spark.operators.tfidf import pmi_cooccurrence

    spark = get_spark(app_name="nahuatl-scale-round9-pmi")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _open_vocab_docs(spark, sf_dir)
    n_docs = docs.count()  # warm

    # exact planned pair volume Σ C(d, 2) per variant, computed from the
    # (doc, term) table the operator actually joins
    dt = docs.select("doc_id", F.explode(token_set("text")).alias("term"))
    d_sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("d"))
    vol_uncapped = d_sizes.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("v")
    ).collect()[0][0]
    tc = dt.groupBy("term").agg(F.count(F.lit(1)).alias("n_t"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_t").desc(), F.col("term").asc())
    vocab = (
        tc.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 1000)
        .select("term")
    )
    d_capped = (
        dt.join(F.broadcast(vocab), "term", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    vol_capped = d_capped.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("v")
    ).collect()[0][0]

    for tag, mv in (("capped_1000", 1000), ("uncapped", None)):
        t0 = time.perf_counter()
        rows = pmi_cooccurrence(
            docs, "doc_id", "text", min_pair_docs=25, top_k=15, max_vocab=mv
        ).collect()
        wall = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "probe": "pmi_open_vocab",
                    "variant": tag,
                    "sf_dir": sf_dir,
                    "docs": n_docs,
                    "pair_volume": int(
                        vol_capped if mv else vol_uncapped
                    ),
                    "wall_sec": wall,
                    "out_rows": len(rows),
                }
            ),
            flush=True,
        )


def q138_probe(sf_dir: str, reps: int) -> None:
    from nahuatl_data_pipeline_spark import registry

    spark = get_spark(app_name="nahuatl-scale-round9-q138")
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry.queries()["q138_dsir_importance"]
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM
    walls = []
    for i in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 2))
    print(
        json.dumps(
            {
                "probe": "q138_repeat",
                "sf_dir": sf_dir,
                "walls": walls,
                "min": min(walls),
                "median": sorted(walls)[len(walls) // 2],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "pmi"
    if mode == "pmi":
        pmi_probe(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf10u")
    elif mode == "q138":
        q138_probe(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
            int(sys.argv[3]) if len(sys.argv) > 3 else 5,
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")
