"""Structured Streaming tests: stream-vs-batch equality on the same files
(the Structured Streaming contract), watermark dedup, incremental CDC."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from nahuatl_data_pipeline_spark.streaming.incremental import (
    EVENT_SCHEMA,
    incremental_batch,
    read_event_stream,
    run_stream_to_memory,
    streaming_dedup,
    windowed_event_counts,
)


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def event_dir(spark, tmp_path):
    rows = [
        (1, _ts(10, 0), 100, "click", 1.0, None),
        (2, _ts(10, 30), 101, "click", 2.0, None),
        (3, _ts(11, 15), 100, "view", 3.0, None),
        (4, _ts(11, 45), 102, "click", 4.0, None),
        (5, _ts(12, 5), 100, "view", 5.0, None),
        (5, _ts(12, 5), 100, "view", 5.0, None),  # exact duplicate event
    ]
    path = str(tmp_path / "events")
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(2).write.parquet(path)
    return path


def test_stream_equals_batch_windowed_counts(spark, event_dir):
    batch = windowed_event_counts(spark.read.schema(EVENT_SCHEMA).parquet(event_dir))
    stream = windowed_event_counts(read_event_stream(spark, event_dir))
    run_stream_to_memory(stream, "wc_test", output_mode="complete")
    got = sorted(
        map(tuple, spark.table("wc_test").collect())
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) >= 3


def test_stream_equals_batch_hopping_counts(spark, event_dir):
    """Hopping variant (2 h window / 1 h slide): every event lands in
    exactly two windows, and stream output equals the batch run."""
    batch = windowed_event_counts(
        spark.read.schema(EVENT_SCHEMA).parquet(event_dir),
        "2 hours",
        "4 hours",
        slide_duration="1 hour",
    )
    stream = windowed_event_counts(
        read_event_stream(spark, event_dir),
        "2 hours",
        "4 hours",
        slide_duration="1 hour",
    )
    run_stream_to_memory(stream, "hop_test", output_mode="complete")
    got = sorted(map(tuple, spark.table("hop_test").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    # fan-out check: Σ n_events = 2 × input rows (window/slide = 2)
    total = sum(r[2] for r in want)
    assert total == 2 * 6


def test_streaming_dedup_drops_duplicate_events(spark, event_dir):
    stream = streaming_dedup(
        read_event_stream(spark, event_dir), keys=["event_id"], watermark="4 hours"
    )
    run_stream_to_memory(stream, "dedup_test")
    out = spark.table("dedup_test")
    assert out.count() == 5  # 6 rows, one exact dup dropped
    assert out.filter(F.col("event_id") == 5).count() == 1


def test_streaming_dedup_batch_degradation(spark, event_dir):
    df = spark.read.schema(EVENT_SCHEMA).parquet(event_dir)
    out = streaming_dedup(df, keys=["event_id"])
    assert not out.isStreaming and out.count() == 5


def test_incremental_batch_watermark(spark, event_dir):
    all_rows = incremental_batch(
        spark, event_dir, "ts", last_sync=None, schema=EVENT_SCHEMA
    )
    assert all_rows.count() == 6
    tail = incremental_batch(
        spark, event_dir, "ts", last_sync="2024-01-01 11:00:00", schema=EVENT_SCHEMA
    )
    assert sorted(r["event_id"] for r in tail.collect()) == [3, 4, 5, 5]
    # watermark predicate reaches the parquet scan
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts" in (
        tail._jdf.queryExecution().executedPlan().toString()
    )


def test_incremental_resume_cycle(spark, event_dir, tmp_path):
    """Two-cycle CDC: process, persist max watermark, only new data next."""
    first = incremental_batch(spark, event_dir, "ts", None, schema=EVENT_SCHEMA)
    wm = first.agg(F.max("ts").alias("wm")).collect()[0]["wm"]
    # new file lands after the first sync
    late = [(7, _ts(13, 0), 103, "click", 7.0, None)]
    spark.createDataFrame(late, EVENT_SCHEMA).write.mode("append").parquet(event_dir)
    second = incremental_batch(
        spark, event_dir, "ts", str(wm), schema=EVENT_SCHEMA
    )
    assert [r["event_id"] for r in second.collect()] == [7]


def test_stateless_curation_ops_compose_with_streams(spark, tmp_path):
    """PII redaction and C4 flags are stateless projections, so the SAME
    operator objects run unchanged on a readStream — stream output must
    equal the batch run on identical files."""
    from nahuatl_data_pipeline_spark.functions.pii import redact_pii
    from nahuatl_data_pipeline_spark.operators.curation import c4_rule_flags
    from nahuatl_data_pipeline_spark.streaming.incremental import (
        run_stream_to_memory,
    )

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "contact a@b.example about the meeting agenda today."),
            (2, "plain prose with no contacts at all in this line"),
        ],
        "doc_id long, text string",
    ).write.parquet(path)
    schema = "doc_id long, text string"

    def curate(df):
        return c4_rule_flags(
            df.withColumn("text", redact_pii(F.col("text"))), min_words=5
        )

    batch = sorted(map(tuple, curate(spark.read.schema(schema).parquet(path)).collect()))
    stream = curate(spark.readStream.schema(schema).parquet(path))
    run_stream_to_memory(stream, "curate_stream", output_mode="append")
    got = sorted(map(tuple, spark.table("curate_stream").collect()))
    assert got == batch and len(got) == 2


def test_stream_equals_batch_ohlc(spark, event_dir):
    from nahuatl_data_pipeline_spark.operators.timeseries import ohlc_downsample
    from nahuatl_data_pipeline_spark.streaming.incremental import ohlc_stream

    stream = ohlc_stream(read_event_stream(spark, event_dir))
    run_stream_to_memory(stream, "ohlc_test", output_mode="complete")
    got = sorted(map(tuple, spark.table("ohlc_test").collect()))

    # CROSS-OPERATOR parity: a backfill with the BATCH operator must
    # produce byte-identical bars (same contract, layout, no rounding)
    backfill = ohlc_downsample(
        spark.read.schema(EVENT_SCHEMA).parquet(event_dir),
        ts="ts", value="value", by=["event_type"],
        width="1 hour", tiebreak=["event_id"],
    ).select("event_type", "bar_ts", "open", "high", "low", "close", "volume")
    assert got == sorted(map(tuple, backfill.collect())) and len(got) >= 3
    # fixture hour 10 has clicks 1.0@10:00 then 2.0@10:30:
    # open=1.0 close=2.0 high=2.0 low=1.0
    bars = {(r[1].hour, r[0]): r for r in spark.table("ohlc_test").collect()}
    b = bars[(10, "click")]
    assert (b["open"], b["high"], b["low"], b["close"], b["volume"]) == (
        1.0, 2.0, 1.0, 2.0, 2
    )


def test_stream_cms_equals_batch_sketch(spark, tmp_path):
    """Streaming CMS accumulation (cell-wise merge per micro-batch) must
    be BIT-IDENTICAL to one batch cms_build over the same rows — the
    mergeability contract that makes the sketch valid streaming state."""
    from nahuatl_data_pipeline_spark.operators.sketches import cms_build
    from nahuatl_data_pipeline_spark.streaming.sketch_sink import (
        CmsAccumulator,
    )

    rows = [
        (i, _ts(10 + i % 3), 100 + i, f"type{i % 7}", float(i), None)
        for i in range(200)
    ]
    path = str(tmp_path / "cms_events")
    spark.createDataFrame(rows, EVENT_SCHEMA).repartition(4).write.parquet(
        path
    )

    acc = CmsAccumulator("event_type", width=256, depth=3)
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(acc.merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert acc.batches_merged > 1  # actually exercised the merge path

    batch = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(
            spark.read.parquet(path), "event_type", width=256, depth=3
        ).collect()
    }
    assert acc.cells == batch

    # accumulated sketch is a drop-in for cms_estimate
    from nahuatl_data_pipeline_spark.operators.sketches import cms_estimate

    keys = spark.createDataFrame([(f"type{i}",) for i in range(7)], ["k"])
    est = {
        r["k"]: r["cms_estimate"]
        for r in cms_estimate(
            acc.to_df(spark), keys, "k", width=256, depth=3
        ).collect()
    }
    import collections

    true = collections.Counter(f"type{i % 7}" for i in range(200))
    assert all(est[k] >= true[k] for k in true)  # one-sided error holds


def test_minwise_accumulator_stream_equals_one_batch(spark, tmp_path):
    """Streaming minwise state after the whole stream == the one-batch
    sketch, bit for bit — MIN merges are order-independent."""
    from nahuatl_data_pipeline_spark.operators.sketches import (
        minwise_overlap,
        minwise_sketch,
    )
    from nahuatl_data_pipeline_spark.streaming.sketch_sink import (
        MinwiseAccumulator,
    )

    rows = [
        (i, _ts(10 + i % 3), 100 + i % 37, f"type{i % 7}", float(i), None)
        for i in range(200)
    ]
    path = str(tmp_path / "minwise_events")
    spark.createDataFrame(rows, EVENT_SCHEMA).repartition(4).write.parquet(
        path
    )

    acc = MinwiseAccumulator("user_id", k=16)
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(acc.merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert acc.batches_merged > 1

    batch = {
        r["i"]: r["h"]
        for r in minwise_sketch(
            spark.read.parquet(path), "user_id", k=16
        ).collect()
    }
    assert acc.mins == batch

    # accumulated sketch is a drop-in for minwise_overlap
    sk = acc.to_df(spark)
    est = minwise_overlap(sk, sk, k=16).collect()[0]
    assert est["est_jaccard"] == 1.0
    assert 0.3 * 37 <= est["est_a"] <= 3 * 37  # k=16: loose belt


def test_token_window_chunks_composes_with_streams(spark, tmp_path):
    """token_window_chunks is a stateless row-local explode, so the SAME
    operator runs unchanged on a readStream — the streaming shape of a
    chunk-as-you-ingest pipeline."""
    from nahuatl_data_pipeline_spark.functions.segmentation import (
        token_window_chunks,
    )
    from nahuatl_data_pipeline_spark.streaming.incremental import (
        run_stream_to_memory,
    )

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, None)],
        "doc_id long, text string",
    ).write.parquet(path)
    schema = "doc_id long, text string"

    def chunk(df):
        return token_window_chunks(df, "doc_id", "text", 4, 1)

    batch = sorted(
        map(tuple, chunk(spark.read.schema(schema).parquet(path)).collect())
    )
    stream = chunk(spark.readStream.schema(schema).parquet(path))
    run_stream_to_memory(stream, "chunk_stream", output_mode="append")
    got = sorted(map(tuple, spark.table("chunk_stream").collect()))
    assert got == batch and len(got) == 4


# ---------------------------------------------------------------------------
# Late / out-of-order data through the watermark (round 8 — VERDICT r7 #7)
# ---------------------------------------------------------------------------
#
# Multi-micro-batch protocol: one parquet file per batch written with
# pyarrow under ascending mtimes; maxFilesPerTrigger=1 + availableNow
# makes the file source process them as separate micro-batches in mtime
# order, so the watermark advances BETWEEN files exactly like a live
# stream — which is what makes drop-vs-keep observable at all (a single
# batch would see everything before the watermark ever moves).


def _write_event_file(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        path,
    )


def _staged_dir(tmp_path, batches):
    """Write each batch as one file with strictly increasing mtimes."""
    import os

    d = tmp_path / "staged_events"
    d.mkdir()
    for i, rows in enumerate(batches):
        p = str(d / f"b{i}.parquet")
        _write_event_file(p, rows)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return str(d)


def test_windowed_agg_drops_too_late_keeps_in_tolerance(spark, tmp_path):
    """The documented drop/keep contract for a 1 h-tolerance tumbling
    window: after the watermark passes a window's end, events for it are
    DISCARDED; a late event inside the tolerance still merges into its
    (unfinalized) window.

    Lag note (measured, Spark 4.1): the watermark computed from batch
    N's data becomes effective for INPUT FILTERING in batch N+2 (state
    eviction/append emission commits at batch N+1's end) — hence the
    spacer batch between the watermark-advancing data and the late
    arrivals; a live deployment sees the same one-trigger lag."""
    e = lambda i, ts, v: (i, ts, 100, "click", v, None)
    path = _staged_dir(
        tmp_path,
        [
            # batch 0: on-time. max ts 13:00 → wm 12:00
            [e(1, _ts(10, 0), 1.0), e(2, _ts(12, 10), 2.0), e(3, _ts(13, 0), 3.0)],
            # batch 1: spacer — the 12:00 wm becomes the filter wm next batch
            [e(9, _ts(13, 1), 0.5)],
            # batch 2: 10:30 is TOO LATE ([10,11) end 11:00 ≤ wm 12:00) →
            # dropped; 12:30 is late but in tolerance ([12,13) end > wm) →
            # merges into the still-open window
            [e(4, _ts(10, 30), 10.0), e(5, _ts(12, 30), 4.0)],
            # batch 3: advances wm to 14:30 → finalizes [12,13) and [13,14)
            [e(6, _ts(15, 30), 5.0)],
        ],
    )
    stream = windowed_event_counts(
        read_event_stream(spark, path, max_files_per_trigger=1),
        window_duration="1 hour",
        watermark="1 hour",
    )
    run_stream_to_memory(stream, "late_win_test", output_mode="append")
    got = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in spark.table("late_win_test").collect()
    }
    assert got[_ts(10, 0)] == (1, 1.0)  # too-late event 4 did NOT count
    assert got[_ts(12, 0)] == (2, 6.0)  # late-but-tolerated event 5 DID
    assert got[_ts(13, 0)] == (2, 3.5)  # on-time 13:00 + spacer 13:01
    # [15,16) never finalized under append (wm 14:30 < end) — not emitted
    assert _ts(15, 0) not in got and len(got) == 3


def test_dedup_within_watermark_expires_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate key arriving while its
    state is live is dropped; once the watermark expires the state, the
    key is treated as NEW and re-emitted — the documented bounded-state
    trade vs the reference's grow-forever in-memory index. Spacer batch
    per the measured one-trigger watermark lag (see windowed test)."""
    e = lambda i, ts: (i, ts, 100, "click", 1.0, None)
    path = _staged_dir(
        tmp_path,
        [
            [e(1, _ts(10, 0))],   # id 1 state created @10:00
            [e(99, _ts(13, 0))],  # → wm 12:00; id 1 expires at next commit
            [e(98, _ts(13, 5))],  # spacer: wm 12:00 now the filter wm
            [e(99, _ts(13, 10)), e(1, _ts(13, 30))],  # 99 dup dropped
            #                                           (state @13:00 live);
            #                                           1 re-emitted (expired)
        ],
    )
    stream = streaming_dedup(
        read_event_stream(spark, path, max_files_per_trigger=1),
        keys=["event_id"],
        watermark="1 hour",
    )
    run_stream_to_memory(stream, "late_dedup_test")
    out = spark.table("late_dedup_test")
    assert out.filter(F.col("event_id") == 1).count() == 2
    assert out.filter(F.col("event_id") == 99).count() == 1
    assert out.filter(F.col("event_id") == 98).count() == 1
    assert out.count() == 4


def test_streaming_url_dedup_stream_equals_batch_keysets(spark, tmp_path):
    """streaming_url_dedup (round-12 verdict #5): the canonical-key
    dedup as a stream. First-arrival-wins means the surviving ROW per
    family is arrival-order-dependent, but the surviving KEY SET is
    not — assert (a) exactly one survivor per canonical family, (b)
    the canonical key set equals the batch url_dedup's, (c) junk rows
    (NULL / whitespace-only urls) all pass through undeduplicated,
    (d) the batch degradation IS url_dedup (deterministic winner)."""
    from nahuatl_data_pipeline_spark.functions.url import url_dedup
    from nahuatl_data_pipeline_spark.streaming.incremental import (
        run_stream_to_memory,
        streaming_url_dedup,
    )

    rows = [
        # one page, three crawl variants (tracking param / fragment)
        (1, "2024-01-01 10:00:00", "https://ex.com/p?utm_source=a"),
        (2, "2024-01-01 10:05:00", "https://ex.com/p#top"),
        (3, "2024-01-01 10:10:00", "https://www.ex.com/p"),
        # a second page, two variants
        (4, "2024-01-01 10:00:00", "https://other.com/q?b=2&a=1"),
        (5, "2024-01-01 10:01:00", "https://other.com/q?a=1&b=2"),
        # a singleton
        (6, "2024-01-01 10:02:00", "https://solo.com/x"),
        # junk: NULL and whitespace-only — must pass through
        (7, "2024-01-01 10:03:00", None),
        (8, "2024-01-01 10:04:00", "   "),
    ]
    schema = "doc_id long, ts string, url string"
    path = str(tmp_path / "crawl")
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.write.parquet(path)
    read_schema = "doc_id long, ts timestamp, url string"

    stream = streaming_url_dedup(
        spark.readStream.schema(read_schema).parquet(path),
        "url",
        watermark="1 hour",
    )
    assert stream.isStreaming
    run_stream_to_memory(stream, "url_dedup_stream")
    got = spark.table("url_dedup_stream")

    batch = url_dedup(
        spark.read.schema(read_schema).parquet(path), "url"
    )
    key = lambda frame: sorted(
        r["canonical_url"]
        for r in frame.select("canonical_url").collect()
        if r["canonical_url"]
    )
    assert key(got) == key(batch) == sorted(
        ["https://ex.com/p", "https://other.com/q?a=1&b=2",
         "https://solo.com/x"]
    )
    # junk passes through on both legs
    junk_ids = sorted(
        r["doc_id"]
        for r in got.filter(
            F.col("canonical_url").isNull()
            | (F.col("canonical_url") == "")
        ).collect()
    )
    assert junk_ids == [7, 8]
    assert got.count() == 5  # 3 survivors + 2 junk
    # batch degradation: plain url_dedup, deterministic winners
    deg = streaming_url_dedup(
        spark.read.schema(read_schema).parquet(path), "url"
    )
    assert not deg.isStreaming
    assert sorted(map(tuple, deg.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_url_dedup_first_arrival_within_watermark(spark, tmp_path):
    """Two micro-batches through one checkpoint: the first crawl of a
    page wins; a re-crawl arriving in a later batch (state still live
    under the watermark) is dropped. Parquet sink — the memory sink
    cannot recover from a checkpoint."""
    from nahuatl_data_pipeline_spark.streaming.incremental import (
        streaming_url_dedup,
    )

    path = str(tmp_path / "crawl2")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, ts timestamp, url string"

    def drain():
        stream = streaming_url_dedup(
            spark.readStream.schema(schema).parquet(path),
            "url",
            watermark="4 hours",
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "https://a.com/p?utm_source=x")],
        "doc_id long, ts string, url string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(path)
    drain()
    # second file = a re-crawl of the same page + a new page
    spark.createDataFrame(
        [
            (2, "2024-01-01 10:30:00", "https://a.com/p"),
            (3, "2024-01-01 10:31:00", "https://b.com/q"),
        ],
        "doc_id long, ts string, url string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "append"
    ).parquet(path)
    drain()
    out = {
        int(r["doc_id"]): r["canonical_url"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # doc 1 (first crawl) won; doc 2's re-crawl was dropped by live
    # state; doc 3 is a new page
    assert set(out) == {1, 3}
    assert out[1] == "https://a.com/p"
