"""Small-file compaction for parquet datasets.

Continuous ingestion (streaming foreachBatch appends, incremental CDC
syncs, per-batch dedup output) accretes many small parquet files; at
100 TB the file-listing and per-file open overhead dominates scan time
long before the bytes do. This maintenance operator rewrites a dataset
to a target file size with the minimum number of full-size files.

Target file count comes from the dataset's ACTUAL on-disk bytes (via
Hadoop's FileSystem, so ``s3a://`` etc. work unchanged) — not row
counts, which mispredict wildly across schemas. The rewrite is one job:
``repartition(n)`` (round-robin) balances bytes evenly across output
files, and the write goes to a temp sibling directory first, then
swaps — a failed compaction leaves the original dataset untouched.

Beyond-reference operator (the reference's pandas pipeline writes
single files and never needs it; any Spark lake does).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CompactionPlan:
    """What a compaction run would do — inspect before executing."""

    n_files: int
    total_bytes: int
    target_files: int

    @property
    def worthwhile(self) -> bool:
        """Skip rewrites that wouldn't reduce the file count."""
        return self.target_files < self.n_files


def _dataset_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, size) for every data file under ``path`` (recursive,
    hidden/_SUCCESS files excluded), via the Hadoop FileSystem API so
    every supported scheme behaves identically."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append((st.getPath().toString(), st.getLen()))
    return out


def plan_compaction(
    spark: SparkSession, path: str, target_mb: int = 512
) -> CompactionPlan:
    """Measure the dataset and compute the target file count:
    ``ceil(total_bytes / target_mb)``, minimum 1. 512 MB is a sound
    default for 128 MB-row-group parquet on object storage."""
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    files = _dataset_files(spark, path)
    total = sum(sz for _, sz in files)
    target = max(1, -(-total // (target_mb * 1024 * 1024)))
    return CompactionPlan(
        n_files=len(files), total_bytes=total, target_files=target
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 512,
    force: bool = False,
) -> CompactionPlan:
    """Rewrite the parquet dataset at ``path`` into
    ``plan.target_files`` round-robin-balanced files.

    No-op (returns the plan) when the rewrite would not reduce the file
    count, unless ``force``. Writes to ``<path>__compacting`` then swaps
    via rename, so readers either see the old layout or the new one —
    never a partial write. Not safe against concurrent writers to
    ``path`` (compaction is a maintenance window op, same as any lake).
    """
    plan = plan_compaction(spark, path, target_mb)
    if not plan.worthwhile and not force:
        return plan

    df: DataFrame = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(plan.target_files).write.mode("overwrite").parquet(tmp)

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(hconf)
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__precompact")
    if not fs.rename(dst, old):
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not fs.rename(src, dst):
        fs.rename(old, dst)  # roll back
        raise IOError(f"compaction swap failed: could not move {tmp} in")
    fs.delete(old, True)
    return plan
