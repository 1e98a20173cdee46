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
