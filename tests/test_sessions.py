"""Gap-based sessionization (operators/sessions.py)."""

from __future__ import annotations

import datetime as dt

from pyld_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(eid, T0 + dt.timedelta(seconds=s), u) for eid, s, u in rows],
        "event_id long, ts timestamp_ntz, user_id long",
    )


def test_sessionize_gap_boundaries(spark):
    ev = _events(spark, [
        (1, 0, 7), (2, 100, 7), (3, 100 + 1800, 7),   # gap == 1800: SAME
        (4, 100 + 1800 + 1801, 7),                    # gap > 1800: new
        (5, 0, 8),                                    # other user
    ])
    got = {r["event_id"]: (r["session_seq"], r["session_id"])
           for r in sessionize(ev, gap_seconds=1800).collect()}
    assert got == {
        1: (0, "7#0"), 2: (0, "7#0"), 3: (0, "7#0"),
        4: (1, "7#1"), 5: (0, "8#0"),
    }


def test_sessionize_subsecond_gap_exact(spark):
    base = T0
    ev = spark.createDataFrame(
        [
            (1, base, 1),
            # 1800.000001 s later: strictly greater -> new session
            (2, base + dt.timedelta(seconds=1800, microseconds=1), 1),
            (3, base + dt.timedelta(seconds=3600, microseconds=1), 1),  # ==
        ],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    got = {r["event_id"]: r["session_seq"]
           for r in sessionize(ev, gap_seconds=1800).collect()}
    assert got == {1: 0, 2: 1, 3: 1}


def test_session_stats(spark):
    ev = _events(spark, [
        (1, 0, 7), (2, 50, 7), (3, 10_000, 7), (4, 10_030, 7),
    ])
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_sec"])
        for r in session_stats(ev, gap_seconds=1800).collect()
    }
    assert got == {(7, 0): (2, 50), (7, 1): (2, 30)}


def test_sessionize_partition_invariant(spark):
    ev = _events(
        spark,
        [(i, (i * 733) % 50_000, i % 5) for i in range(300)],
    )
    a = sessionize(ev.repartition(13), 600).collect()
    b = sessionize(ev.repartition(1), 600).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
