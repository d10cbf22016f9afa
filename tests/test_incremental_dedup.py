"""Cross-snapshot incremental dedup."""

from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.operators.incremental_dedup import (
    dedup_against_snapshot,
)

_A = "the river bends east past the old mill where traders load grain"
_B = "snow settled early on the high passes closing the narrow trails"
_C = "lanterns swung from the harbor posts while fishermen mended nets"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_and_near_dups_dropped_novel_kept(spark):
    seen = _df(spark, [(1, _A), (2, _B)])
    new = _df(
        spark,
        [
            (10, _A),                      # exact dup of 1
            (11, "  " + _A.upper() + " "),  # exact after lower/trim
            (12, _A + " extra tail"),      # near dup of 1
            (13, _C),                      # novel
        ],
    )
    out = sorted(
        r["doc_id"]
        for r in dedup_against_snapshot(new, seen, jaccard_threshold=0.5).collect()
    )
    assert out == [13]


def test_exact_only_mode(spark):
    seen = _df(spark, [(1, _A)])
    new = _df(spark, [(10, _A), (12, _A + " extra tail")])
    out = sorted(
        r["doc_id"]
        for r in dedup_against_snapshot(new, seen, jaccard_threshold=None).collect()
    )
    assert out == [12]  # near-dup survives when fuzzy pass is off


def test_empty_snapshot_keeps_everything(spark):
    seen = _df(spark, [])
    new = _df(spark, [(1, _A), (2, _B)])
    assert dedup_against_snapshot(new, seen).count() == 2


def test_new_batch_internal_dups_not_touched(spark):
    """Incremental dedup screens against the SNAPSHOT only — two copies
    inside the new batch both survive (batch-internal dedup is q10's
    job, run separately)."""
    seen = _df(spark, [(1, _B)])
    new = _df(spark, [(10, _A), (11, _A)])
    assert dedup_against_snapshot(new, seen).count() == 2


def test_null_text_matches_null_snapshot_key(spark):
    seen = _df(spark, [(1, None)])
    new = _df(spark, [(10, None), (11, _C)])
    out = [r["doc_id"] for r in dedup_against_snapshot(new, seen).collect()]
    assert out == [11]
