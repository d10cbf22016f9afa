"""SparkSession factory.

Mirrors the session tuning of the reference's one Spark job
(``src/scala_examples/SparkDedup.scala:156-165``: AQE on, tuned shuffle
partitions) and adds the settings a 100 TB deployment wants on by default:
adaptive coalescing + skew-join handling, Arrow for any pandas exchange,
and a pinned UTC session timezone so date bucketing is deterministic
across clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test default. On a real cluster leave shuffle partitions high
# (or unset) and let AQE coalesce; 32 matches the local[32] test harness.
# SPARK_GRAFT_CPUS doubles as the local[N] spec, where '*' is legal — a
# non-numeric value falls back to 32 rather than poisoning the integer
# shuffle-partitions conf.
_cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
_DEFAULT_SHUFFLE_PARTITIONS = _cpus_env if _cpus_env.isdigit() else "32"


def get_spark(
    app_name: str = "nahuatl-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    AQE is enabled so runtime statistics re-plan shuffles (partition
    coalescing, skew-join splitting, dynamic broadcast) — this is what makes
    the same plan viable at sf0.001 and at 100 TB.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffles START wide and AQE coalesces them down when small:
        # per-task aggregation state is bounded by input/initialN, so a
        # 100x corpus cannot blow a hash-aggregate's memory just because
        # the static shuffle-partition count matched the core count
        # (observed: AGGREGATE_OUT_OF_MEMORY in the curation pipeline's
        # repetition/dedup aggregates at the 100x replica with 32 static
        # partitions; 256 initial fixed it with no measurable cost at
        # sf0.1 — AQE merges the small partitions right back).
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "256"),
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(
                shuffle_partitions
                if shuffle_partitions is not None
                else _DEFAULT_SHUFFLE_PARTITIONS
            ),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # session default, not a mid-run flip: TIMESTAMP(NANOS) parquet
        # columns decode as LongType everywhere (schemas.load_table
        # truncates ns→µs explicitly; see its docstring)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Keep the UI off in test/bench runs; it costs startup time.
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
