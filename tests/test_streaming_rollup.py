"""Streaming continuous aggregate (stream_event_rollup) vs the batch
time_rollup finest grain: every emitted bucket must match the batch
answer exactly, and all watermark-closed buckets must be emitted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_stream_rollup_matches_batch(spark, sf_dir, tmp_path):
    from pyld_spark.operators.rollup import time_rollup
    from pyld_spark.streaming.stream import stream_event_rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_in")
    events.repartition(6).write.parquet(src)

    q = stream_event_rollup(
        spark, src, str(tmp_path / "ckpt"),
        grain="minute", watermark="1 hour",
        query_name="rollup_parity",
    )
    q.awaitTermination(300)

    got = {
        (str(r.bucket), r.event_type):
            (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in spark.table("rollup_parity").collect()
    }
    batch = {
        (str(r.bucket), r.event_type):
            (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in time_rollup(events, grains=("minute",)).collect()
    }

    # 1. everything emitted is exactly the batch answer
    assert got, "stream emitted nothing"
    for key, vals in got.items():
        assert batch[key] == vals, key

    # 2. append mode withholds only still-open buckets: every bucket whose
    # window closed before (max event time - watermark) must be present
    max_ts, = events.agg(F.max("ts")).first()
    closed = {
        k for k, _ in batch.items()
        if (max_ts - __import__("datetime").datetime.fromisoformat(k[0])
            ).total_seconds() > 3600 + 60
    }
    missing = closed - set(got)
    assert not missing, sorted(missing)[:5]
    # and the replay should close the overwhelming majority
    assert len(got) >= 0.9 * len(batch)


def test_stream_rollup_bad_grain(spark, tmp_path):
    from pyld_spark.streaming.stream import stream_event_rollup

    with pytest.raises(ValueError, match="grain"):
        stream_event_rollup(spark, str(tmp_path), str(tmp_path / "c"),
                            grain="fortnight")


def test_stream_rollup_recovers_from_mid_replay_kill(spark, sf_dir, tmp_path):
    """Round-5 verdict item 5: kill stream_event_rollup AFTER a partial
    availableNow drain (batches 0-1 committed, batch 2 fails mid-replay),
    resume on the same checkpoint, and assert the buckets emitted across
    the kill, the resume, and a final no-new-data flush run are pairwise
    exactly-once and cover every watermark-closed bucket with values equal
    to the batch rollup.

    The file source orders by MODIFICATION time, so the 8 time-contiguous
    slices are appended sequentially (distinct mtimes) — one parallel
    write would arrive in arbitrary order and whole late slices would be
    (bucket-atomically) dropped below the watermark."""
    import datetime
    import time

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from pyld_spark.operators.rollup import time_rollup
    from pyld_spark.streaming.stream import stream_event_rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    src = str(tmp_path / "events_in")
    step = (hi - lo) / 8
    for i in range(8):
        s, e = lo + i * step, hi if i == 7 else lo + (i + 1) * step
        (events.filter((F.col("ts") >= s) & (F.col("ts") <= e))
         .coalesce(1).write.mode("append").parquet(src))
        time.sleep(0.05)  # distinct mtimes -> deterministic arrival order
    ckpt = str(tmp_path / "ckpt")

    def key_rows(rows):
        return {
            (str(r.bucket), r.event_type):
                (r.n_events, r.sum_value, r.min_value, r.max_value)
            for r in rows
        }

    def collector(store):
        return lambda df, bid: store.extend(df.collect())

    # phase 1: crash while processing batch 2 — batches 0-1 are committed,
    # batch 2 is mid-replay (attempted, never committed)
    phase1 = []

    def crashing_sink(df, batch_id):
        if batch_id >= 2:
            raise RuntimeError("injected mid-replay kill")
        phase1.extend(df.collect())

    q1 = stream_event_rollup(
        spark, src, ckpt, grain="minute", watermark="1 hour",
        query_name="rollup_kill", max_files_per_trigger=1,
        foreach_batch=crashing_sink,
    )
    with pytest.raises(StreamingQueryException, match="injected"):
        q1.awaitTermination(300)
    got1 = key_rows(phase1)
    assert got1, "no buckets closed before the kill — kill landed too early"

    # phase 2: NEW query, SAME checkpoint — resumes from (re-runs) batch 2
    phase2 = []
    q2 = stream_event_rollup(
        spark, src, ckpt, grain="minute", watermark="1 hour",
        query_name="rollup_resume", max_files_per_trigger=1,
        foreach_batch=collector(phase2),
    )
    assert q2.awaitTermination(300)
    got2 = key_rows(phase2)

    # phase 3: no new data — may only flush windows the FINAL batch's
    # watermark advance closed but never emitted (availableNow ends
    # without a trailing no-data batch); never re-emits
    phase3 = []
    q3 = stream_event_rollup(
        spark, src, ckpt, grain="minute", watermark="1 hour",
        query_name="rollup_flush", max_files_per_trigger=1,
        foreach_batch=collector(phase3),
    )
    assert q3.awaitTermination(300)
    got3 = key_rows(phase3)

    # exactly-once across the restart and the flush
    assert not set(got1) & set(got2), sorted(set(got1) & set(got2))[:5]
    assert not set(got1) & set(got3), sorted(set(got1) & set(got3))[:5]
    assert not set(got2) & set(got3), sorted(set(got2) & set(got3))[:5]

    # every emitted bucket matches the batch rollup exactly
    batch = key_rows(time_rollup(events, grains=("minute",)).collect())
    got = {**got1, **got2, **got3}
    for key, vals in got.items():
        assert batch[key] == vals, key

    # completeness: every bucket closed by the final watermark is present
    closed = {
        k for k in batch
        if (hi - datetime.datetime.fromisoformat(k[0])
            ).total_seconds() > 3600 + 60
    }
    assert closed <= set(got), sorted(closed - set(got))[:5]
