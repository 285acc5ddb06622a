"""Structured Streaming: AvailableNow incremental contract, windowed
rollup, streaming dedup, custom stateful operator."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from msgvault_spark.streaming.incremental import (
    EVENTS_SCHEMA,
    read_events_stream,
    run_available_now,
    stream_dedup,
    windowed_rollup,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, schema=EVENTS_SCHEMA).write.mode(
        "append"
    ).parquet(path)


def _us(s: str) -> int:
    return int(
        dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    ) * 1000  # ns, matching the nanosAsLong read path


_ROWS_BATCH1 = [
    (1, _us("2024-01-01T10:00:00"), 100, "click", 1.5, "{}"),
    (2, _us("2024-01-01T11:00:00"), 100, "click", 2.5, "{}"),
    (3, _us("2024-01-02T09:00:00"), 200, "view", 1.0, "{}"),
]
_ROWS_BATCH2 = [
    (4, _us("2024-01-02T10:00:00"), 200, "view", 4.0, "{}"),
    (2, _us("2024-01-01T11:00:00"), 100, "click", 2.5, "{}"),  # dup of #2
]


def test_available_now_incremental(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    _write_events(spark, src, _ROWS_BATCH1)

    rollup = windowed_rollup(read_events_stream(spark, src))
    got = run_available_now(
        rollup, checkpoint_dir=ckpt, queryName="rollup1", output_mode="complete"
    )
    by_key = {(r["day"], r["event_type"]): r["events"] for r in got.collect()}
    assert by_key == {("2024-01-01", "click"): 2, ("2024-01-02", "view"): 1}

    # second run (fresh checkpoint subdir — the memory sink cannot recover
    # one, see run_available_now) reprocesses all files; the only-new-files
    # incremental contract (build_cache.go:125-143) is pinned on the
    # foreachBatch path by test_stream_to_lake_exactly_once
    _write_events(spark, src, _ROWS_BATCH2)
    got2 = run_available_now(
        windowed_rollup(read_events_stream(spark, src)),
        checkpoint_dir=ckpt,
        queryName="rollup2",
        output_mode="complete",
    )
    by_key2 = {(r["day"], r["event_type"]): r["events"] for r in got2.collect()}
    assert by_key2[("2024-01-02", "view")] == 2
    assert by_key2[("2024-01-01", "click")] == 3  # dup not dropped here


def test_stream_dedup(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    _write_events(spark, src, _ROWS_BATCH1 + _ROWS_BATCH2)
    deduped = run_available_now(
        stream_dedup(read_events_stream(spark, src)),
        queryName="dedup1",
    )
    ids = sorted(r["event_id"] for r in deduped.collect())
    assert ids == [1, 2, 3, 4]


def test_stateful_session_tracker(spark, tmp_path):
    from msgvault_spark.streaming.stateful import user_session_stats

    src = str(tmp_path / "state_src")
    rows = [
        # user 100: two events 5 min apart (1 session), one 2h later (2nd)
        (1, _us("2024-01-01T10:00:00"), 100, "click", 1.0, "{}"),
        (2, _us("2024-01-01T10:05:00"), 100, "click", 2.0, "{}"),
        (3, _us("2024-01-01T12:30:00"), 100, "click", 3.0, "{}"),
        # user 200: single event
        (4, _us("2024-01-01T09:00:00"), 200, "view", 5.0, "{}"),
    ]
    _write_events(spark, src, rows)
    got = run_available_now(
        user_session_stats(read_events_stream(spark, src)),
        queryName="sessions1",
        output_mode="update",
    )
    by_user = {r["user_id"]: r for r in got.collect()}
    assert by_user[100]["events"] == 3
    assert by_user[100]["sessions"] == 2
    assert by_user[100]["total_value_fp"] == 600  # Σ floor(v·100), exact
    assert by_user[200]["sessions"] == 1


def test_stream_to_lake_exactly_once(spark, tmp_path):
    """foreachBatch lake append: run → rows land; re-run same checkpoint →
    NO duplicates; new source file → only its rows append."""
    from msgvault_spark.streaming.incremental import stream_to_lake

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [
        (1, _us("2024-01-01T10:00:00"), 100, "click", 1.0, "{}"),
        (2, _us("2024-01-01T10:05:00"), 100, "view", 2.0, "{}"),
    ]
    _write_events(spark, src, rows1)
    stream_to_lake(read_events_stream(spark, src), lake, ckpt)
    assert spark.read.parquet(lake).count() == 2

    # idempotent re-run: checkpoint says nothing new
    stream_to_lake(read_events_stream(spark, src), lake, ckpt)
    assert spark.read.parquet(lake).count() == 2

    # a new shard appends only its own rows
    _write_events(
        spark, src, [(3, _us("2024-01-02T09:00:00"), 200, "click", 3.0, "{}")]
    )
    stream_to_lake(read_events_stream(spark, src), lake, ckpt)
    got = spark.read.parquet(lake)
    assert got.count() == 3
    assert {r["event_id"] for r in got.collect()} == {1, 2, 3}


def test_stream_to_lake_batch_redelivery_idempotent(spark, tmp_path):
    """The at-least-once hole: a batch re-delivered after the lake write but
    before the checkpoint commit must not duplicate rows. Simulated by
    wiping the checkpoint (batch 0 replays wholesale) — the per-batch_id
    done-marker makes the replay a no-op."""
    import shutil

    from msgvault_spark.streaming.incremental import stream_to_lake

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    _write_events(spark, src, [(1, _us("2024-01-01T10:00:00"), 1, "c", 1.0, "{}")])
    stream_to_lake(read_events_stream(spark, src), lake, ckpt)
    assert spark.read.parquet(lake).count() == 1

    shutil.rmtree(ckpt)  # forget progress → same batch_id=0 re-delivered
    stream_to_lake(read_events_stream(spark, src), lake, ckpt)
    assert spark.read.parquet(lake).count() == 1  # marker skipped the dup


def test_watermark_drops_data_beyond_horizon(spark, tmp_path):
    """Late-data contract of the windowed rollup (2-day watermark): after a
    run persists the watermark in the checkpoint, a subsequent incremental
    run must DROP rows older than the horizon while still accepting
    late-but-within-horizon rows. foreachBatch (the only sink that
    recovers from a checkpoint) appends each update-mode batch to parquet;
    update mode makes the distinction observable — a kept late row
    re-emits its window, a dropped one emits nothing."""
    import os

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    out1 = str(tmp_path / "late_out1")
    out2 = str(tmp_path / "late_out2")

    def run(out_dir):
        def write_batch(bdf, bid):
            bdf.write.mode("append").parquet(out_dir)

        q = (
            windowed_rollup(read_events_stream(spark, src))
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    _write_events(spark, src, [
        (10, _us("2024-01-10T08:00:00"), 1, "click", 1.0, "{}"),
        (11, _us("2024-01-10T09:00:00"), 1, "click", 1.0, "{}"),
    ])
    run(out1)
    assert {r["day"] for r in spark.read.parquet(out1).collect()} == {
        "2024-01-10"
    }

    # watermark persisted ~= 2024-01-08T09; second batch: one row beyond
    # it, one late-but-inside, one fresh
    _write_events(spark, src, [
        (12, _us("2024-01-05T12:00:00"), 1, "click", 1.0, "{}"),  # beyond
        (13, _us("2024-01-09T12:00:00"), 1, "view", 1.0, "{}"),   # inside
        (14, _us("2024-01-11T10:00:00"), 1, "view", 1.0, "{}"),   # fresh
    ])
    run(out2)
    days2 = {r["day"] for r in spark.read.parquet(out2).collect()}
    assert "2024-01-05" not in days2   # beyond-horizon row dropped
    assert "2024-01-09" in days2       # within-horizon late row kept
    assert "2024-01-11" in days2       # fresh row kept


def test_session_tracker_sorts_across_arrow_chunks():
    """A group reaches _track as an ITERATOR of Arrow chunks in shuffle
    order; last_ts carries across chunks, so the tracker must globally
    sort the batch. Two out-of-order chunks straddling a session gap must
    count the same sessions as one sorted chunk."""
    import pandas as pd

    from msgvault_spark.streaming.stateful import _track

    class _State:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.val = v

        def remove(self):
            pass

    hour = 3_600_000_000_000  # ns
    mk = lambda ts_ns: pd.DataFrame(
        {"ts": pd.Series(ts_ns, dtype="int64"), "value": [1.0] * len(ts_ns)}
    )
    # chunk order delivers the LATER timestamp first: sorted-globally the
    # gaps are [0h -> 2h] (one 2h gap = 2 sessions); per-chunk sorting
    # with carry-over would see 2h then 0h (negative delta) = 1 session
    out_split = list(
        _track((1,), iter([mk([2 * hour]), mk([0])]), _State())
    )[0]
    out_one = list(_track((1,), iter([mk([0, 2 * hour])]), _State()))[0]
    assert out_split["sessions"].iloc[0] == 2
    assert out_split["sessions"].iloc[0] == out_one["sessions"].iloc[0]
    assert out_split["events"].iloc[0] == 2


def test_enriched_segment_rollup_semantics_batch_mode(spark):
    """The stream-static rollup's transformation, applied to a batch
    frame (watermark is a no-op in batch): enrichment is an inner join
    (unknown users drop), value mass is fixed-point."""
    import datetime as dt

    from pyspark.sql import functions as F

    from msgvault_spark.streaming.incremental import enriched_segment_rollup

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10), 1.25),
            (1, dt.datetime(2024, 1, 1, 11), 2.50),
            (2, dt.datetime(2024, 1, 2, 9), 4.00),
            (99, dt.datetime(2024, 1, 2, 9), 8.00),  # no dim row → drops
        ],
        "user_id long, ts timestamp, value double",
    )
    dim = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")], "user_id long, segment string"
    )
    out = {
        (r["day"], r["segment"]): r
        for r in enriched_segment_rollup(ev, dim).collect()
    }
    assert out[("2024-01-01", "BUILDING")]["events"] == 2
    assert out[("2024-01-01", "BUILDING")]["total_value_fp"] == 375
    assert out[("2024-01-02", "MACHINERY")]["events"] == 1
    assert len(out) == 2  # the unknown user contributed nothing
