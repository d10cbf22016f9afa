"""Small-file compaction maintenance operator."""

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.sources.compaction import (
    compact_parquet,
    plan_compaction,
)


def _fragmented(spark, tmp_path, n_appends=8, rows_each=50):
    path = str(tmp_path / "frag")
    for i in range(n_appends):
        spark.range(i * rows_each, (i + 1) * rows_each).withColumn(
            "payload", F.concat(F.lit("row-"), F.col("id").cast("string"))
        ).repartition(4).write.mode("append").parquet(path)
    return path


def test_plan_measures_real_files(spark, tmp_path):
    path = _fragmented(spark, tmp_path)
    plan = plan_compaction(spark, path, target_mb=512)
    assert plan.n_files == 32  # 8 appends x 4 partitions
    assert plan.total_bytes > 0
    assert plan.target_files == 1  # tiny dataset fits one 512 MB file
    assert plan.worthwhile


def test_compact_preserves_data_and_reduces_files(spark, tmp_path):
    path = _fragmented(spark, tmp_path)
    before = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    plan = compact_parquet(spark, path, target_mb=512)
    assert plan.worthwhile
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    replan = plan_compaction(spark, path, target_mb=512)
    assert replan.n_files == 1
    # no leftover temp/backup dirs
    leftovers = [
        p.name
        for p in tmp_path.iterdir()
        if "__compacting" in p.name or "__precompact" in p.name
    ]
    assert leftovers == []


def test_already_compact_is_noop(spark, tmp_path):
    path = str(tmp_path / "one")
    spark.range(10).coalesce(1).write.parquet(path)
    files_before = plan_compaction(spark, path).n_files
    plan = compact_parquet(spark, path, target_mb=512)
    assert not plan.worthwhile
    assert plan_compaction(spark, path).n_files == files_before == 1


def test_invalid_target(spark, tmp_path):
    path = str(tmp_path / "x")
    spark.range(3).write.parquet(path)
    with pytest.raises(ValueError):
        plan_compaction(spark, path, target_mb=0)
