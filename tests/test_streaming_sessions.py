"""Stateful streaming: applyInPandasWithState sessionization (cross-batch
state carry, batch parity) and watermarked windowed term counts (late-row
drop, append-mode finalization)."""

from __future__ import annotations

import datetime as dt
import os
import time
import uuid

from fulltextsearch_spark.streaming.sessions import (
    streaming_sessionize,
    windowed_term_counts,
)

EPOCH = dt.datetime(2024, 1, 1)
# absolute microseconds-since-unix-epoch of EPOCH (session tz is UTC)
BASE_US = int(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def _write_file(spark, land, name, rows, cols, mtime):
    path = os.path.join(land, name)
    spark.createDataFrame(rows, cols).coalesce(1).write.mode("overwrite").parquet(path)
    # file-source batches order by modification time under maxFilesPerTrigger
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))
    return path


def _run_stream(spark, reader_df, transform, sink_name):
    q = (
        transform(reader_df)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/fts_ss_{sink_name}_{uuid.uuid4().hex}")
        .trigger(availableNow=True)
        .start()
    )
    while q.isActive:
        time.sleep(1)
    return spark.sql(f"SELECT * FROM {sink_name}"), q.recentProgress


def test_streaming_sessionize_cross_batch_and_parity(spark, tmp_path):
    land = str(tmp_path / "land")
    os.makedirs(land)
    now = time.time()
    # u1: session A spans both batches (state carry), then an in-batch-2 gap
    # closes it; u2 closes a single-event session inside batch 1.
    _write_file(
        spark, land, "f1",
        [(1, 0, _ts(0)), (1, 1, _ts(100)), (2, 2, _ts(0)), (2, 3, _ts(10000))],
        ["user_id", "event_id", "ts"], now - 20,
    )
    _write_file(
        spark, land, "f2",
        [(1, 4, _ts(1000)), (1, 5, _ts(50000))],
        ["user_id", "event_id", "ts"], now - 10,
    )
    stream = (
        spark.readStream.schema("user_id LONG, event_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(land + "/*")  # each batch file is a parquet DIRECTORY
    )
    out, _ = _run_stream(
        spark, stream, lambda s: streaming_sessionize(s, gap_s=1800.0), "sess_sink"
    )
    got = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in out.collect()
    )
    us = 1_000_000
    # u1 session [0, 1000s] has 3 events ACROSS batches; u2's [0,0] closes
    # in-batch. Open tails (u1@50000s, u2@10000s) stay in state, not emitted.
    assert got == [
        (1, BASE_US, BASE_US + 1000 * us, 3),
        (2, BASE_US, BASE_US, 1),
    ]


def test_windowed_term_counts_watermark_and_finalization(spark, tmp_path):
    """A window finalizes exactly once when the watermark passes its end; a
    late row arriving AFTER its window was evicted is dropped (Spark evicts
    at batch end, so the guaranteed-drop case is arrival >= 2 batches after
    the watermark passed — rows landing in the same batch as the eviction
    still merge, which is within the 'may be dropped' contract)."""
    land = str(tmp_path / "land")
    os.makedirs(land)
    now = time.time()
    h = 3600
    _write_file(spark, land, "f1", [(_ts(10 * h), "cats cats")],
                ["ts", "text"], now - 50)
    _write_file(spark, land, "f2", [(_ts(13 * h), "newts")],
                ["ts", "text"], now - 40)
    # wm during f3's batch is 12:00 -> [10:00,11:00) evicted at its end
    _write_file(spark, land, "f3", [(_ts(15 * h), "owls")],
                ["ts", "text"], now - 30)
    # late cats@10:30 arrives after eviction -> dropped by watermark;
    # herons@17:00 advances event time (its window never finalizes)
    _write_file(
        spark, land, "f4",
        [(_ts(10 * h + 1800), "cats"), (_ts(17 * h), "herons")],
        ["ts", "text"], now - 20,
    )
    stream = (
        spark.readStream.schema("ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(land + "/*")
    )
    out, progress = _run_stream(
        spark,
        stream,
        lambda s: windowed_term_counts(s, window="1 hour", watermark="1 hour"),
        "trend_sink",
    )
    got = {(r["window_start"], r["term"]): r["n"] for r in out.collect()}
    # each finalized window appears exactly once, WITHOUT the late row
    assert got == {
        (_ts(10 * h), "cats"): 2,
        (_ts(13 * h), "newts"): 1,
        (_ts(15 * h), "owls"): 1,
    }
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for op in (p.get("stateOperators") or [])
    )
    assert dropped == 1  # the late cats row, and only it


def test_streaming_dedup_first_cross_batch(spark, tmp_path):
    """Exactly one canonical row per distinct text across micro-batches:
    first-arrival batch wins, min doc_id within a batch; later duplicates
    emit nothing."""
    from fulltextsearch_spark.streaming.sessions import streaming_dedup_first

    land = str(tmp_path / "docs")
    os.makedirs(land, exist_ok=True)
    now = time.time()
    # batch 1: A twice (ids 2, 5), B once
    _write_file(
        spark, land, "b1",
        [(5, "text a"), (2, "text a"), (3, "text b")],
        "doc_id LONG, text STRING", now - 20,
    )
    # batch 2: A again (id 10, must NOT re-emit), C new
    _write_file(
        spark, land, "b2",
        [(10, "text a"), (11, "text c")],
        "doc_id LONG, text STRING", now - 10,
    )
    reader = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(land + "/*")  # each batch file is a parquet DIRECTORY
    )
    out, _ = _run_stream(spark, reader, streaming_dedup_first, f"sd_{uuid.uuid4().hex[:8]}")
    rows = {r["text_hash"]: r["kept_doc_id"] for r in out.collect()}
    import hashlib

    h = lambda t: hashlib.md5(t.encode()).hexdigest()  # noqa: E731
    assert rows == {h("text a"): 2, h("text b"): 3, h("text c"): 11}
