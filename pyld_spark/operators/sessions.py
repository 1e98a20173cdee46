"""Sessionization of event streams: gap-based session windows per user.

The standard telemetry/analytics operator (and the batch twin of the
engine's Structured-Streaming session windows in streaming/stream.py): an
event belongs to the same session as its predecessor iff the gap to it is
≤ ``gap_seconds``. Pure window functions — lag + a running sum of
boundary flags — partitioned by the user key:

- one shuffle on ``user_id`` total, no joins, no iteration;
- per-user partitions are bounded by that user's event count (AQE handles
  the odd hyperactive user the way it handles any hot aggregation key);
- deterministic: ties broken by (ts, event_id) ordering, so results are
  partitioning- and run-invariant, and the whole computation replays
  exactly as two SQL window functions (the DuckDB gate oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Tag every event with its session: adds ``session_seq`` (0-based
    per-user session index) and ``session_id`` (user + seq, globally
    unique). ``order_cols`` break timestamp ties deterministically."""
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    # exact integer microseconds (timezone offsets cancel in differences;
    # float epoch seconds would round sub-second gaps differently per engine)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_session = (
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000)
    ).cast("bigint")
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = (F.sum(new_session).over(run) - 1).cast("bigint")
    return events.withColumn("session_seq", seq).withColumn(
        "session_id",
        F.concat(F.col(user_col).cast("string"), F.lit("#"),
                 F.col("session_seq").cast("string")),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """One row per session: (user, session_seq, n_events, started, ended,
    duration_sec). The sessionize window shuffle is reused by the groupBy
    (same key prefix), so the whole thing is one exchange."""
    s = sessionize(events, gap_seconds, user_col, ts_col, order_cols)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min(ts_col).alias("started"),
            F.max(ts_col).alias("ended"),
            F.floor(
                (F.unix_micros(F.max(ts_col).cast("timestamp"))
                 - F.unix_micros(F.min(ts_col).cast("timestamp")))
                / F.lit(1_000_000)
            ).cast("bigint").alias("duration_sec"),
        )
    )
