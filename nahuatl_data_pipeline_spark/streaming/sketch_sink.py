"""Streaming Count-Min sketch accumulation via ``foreachBatch``.

CMS cells are sums, so sketches of disjoint data MERGE by cell-wise
addition (operators/sketches.py module docstring) — which makes the
sketch the natural STREAMING frequency state: each micro-batch is
sketched distributively (the same ``cms_build`` plan batch uses), and
only the fixed ``depth × width`` cell grid crosses to the accumulator.
The result after any prefix of the stream is BIT-IDENTICAL to
``cms_build`` over the same rows as one batch — asserted by the
batch≡stream parity test, the streaming module's standing contract.

The accumulator is driver-side ON PURPOSE: its size is the sketch's
fixed ``depth·width`` (a few thousand cells), independent of stream
volume — exactly the situation where driver state is principled (the
whole point of a sketch is that the summary fits anywhere). The
per-batch ``collect()`` moves ≤ depth·width rows, never data. For a
restartable production topology the same merge runs inside
``foreachBatch`` against a cell-keyed upsert sink (jdbc/delta) with the
checkpoint providing exactly-once per-batch merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nahuatl_data_pipeline_spark.operators.sketches import cms_build


class CmsAccumulator:
    """Cell-wise-merging CMS state + the ``foreachBatch`` hook that
    feeds it. One instance per stream; ``width``/``depth`` fix the
    address space for every merged batch."""

    def __init__(self, key_col: str, width: int = 1024, depth: int = 3):
        self.key_col = key_col
        self.width = width
        self.depth = depth
        self.cells: dict[tuple[int, int], int] = {}
        self.batches_merged = 0

    def merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """``foreachBatch`` hook: sketch the micro-batch distributively,
        pull the ≤ depth·width cell rows, add cell-wise."""
        sketch = cms_build(
            batch_df, self.key_col, width=self.width, depth=self.depth
        )
        for r in sketch.collect():
            k = (r["row"], r["bucket"])
            self.cells[k] = self.cells.get(k, 0) + r["cnt"]
        self.batches_merged += 1

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The accumulated sketch as the same (row, bucket, cnt) shape
        ``cms_build`` emits — drop-in for ``cms_estimate``."""
        rows = [
            (row, bucket, cnt)
            for (row, bucket), cnt in sorted(self.cells.items())
        ]
        return spark.createDataFrame(rows, "row int, bucket bigint, cnt bigint")


class MinwiseAccumulator:
    """Streaming set-cardinality/overlap state: the minwise sketch
    merges by cell-wise MIN (operators/sketches.py:minwise_sketch), so
    each micro-batch is sketched distributively and only k values
    cross to the accumulator — the streaming "how many distinct keys
    so far / how much does this stream overlap that corpus?" primitive
    with O(k) driver state. After any stream prefix the state is
    BIT-IDENTICAL to ``minwise_sketch`` over the same rows as one
    batch (MIN is idempotent-associative-commutative; parity asserted
    in test_streaming.py)."""

    def __init__(self, key_col: str, k: int = 64):
        self.key_col = key_col
        self.k = k
        self.mins: dict[int, int] = {}
        self.batches_merged = 0

    def merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from nahuatl_data_pipeline_spark.operators.sketches import (
            minwise_sketch,
        )

        for r in minwise_sketch(batch_df, self.key_col, k=self.k).collect():
            if r["h"] is None:
                continue
            cur = self.mins.get(r["i"])
            if cur is None or r["h"] < cur:
                self.mins[r["i"]] = r["h"]
        self.batches_merged += 1

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The accumulated sketch as the (i, h) shape
        ``minwise_sketch`` emits — drop-in for ``minwise_overlap``."""
        rows = [
            (i, self.mins.get(i)) for i in range(self.k)
        ]
        return spark.createDataFrame(rows, "i int, h bigint")
