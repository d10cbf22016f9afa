"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing = full plan execution to a count-style action (results are
materialized but not shipped to the driver — we measure engine throughput,
not toPandas serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nahuatl_data_pipeline_spark import registry
from nahuatl_data_pipeline_spark.session import get_spark


def _warm_ml_classes(spark) -> None:
    """One-time pyspark.ml class loading (MinHashLSH / BRP-LSH JARs +
    codegen), ~2-3 s of session setup that would otherwise land inside
    whichever LSH query happens to run first. Uses throwaway params
    (numFeatures=8) so operator-level model caches stay untouched —
    this warms the JVM, never the measured plans."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    tiny = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "id long, v array<double>"
    ).select("id", array_to_vector("v").alias("f"))
    for lsh in (
        MinHashLSH(inputCol="f", outputCol="h", numHashTables=1, seed=1),
        BucketedRandomProjectionLSH(
            inputCol="f", outputCol="h", bucketLength=1.0, numHashTables=1,
            seed=1,
        ),
    ):
        m = lsh.fit(tiny.withColumn("f", F.col("f")))
        m.approxSimilarityJoin(tiny, tiny, 10.0, distCol="d").count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="nahuatl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    _warm_ml_classes(spark)

    for name in sorted(qs):
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.count()  # force full plan execution; 0 rows is legal (e.g. q07)
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
