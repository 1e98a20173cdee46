"""Bin-bucketed point-in-interval join (operators/intervals.py) vs a
brute-force pure-Python replay."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

T0 = datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=float(minutes))


def _brute(points, intervals):
    out = []
    for (pu, pts, pid) in points:
        for (iu, s, e, sid) in intervals:
            if pu == iu and s <= pts <= e:
                out.append((pu, pts, pid, sid))
    return sorted(out)


def test_matches_brute_force_across_bin_widths(spark):
    from pyld_spark.operators.intervals import interval_join

    import numpy as np
    rng = np.random.RandomState(7)
    points = [
        (int(rng.randint(0, 4)), _ts(int(rng.randint(0, 300))), i)
        for i in range(120)
    ]
    intervals = []
    for j in range(25):
        s = int(rng.randint(0, 280))
        intervals.append(
            (int(rng.randint(0, 4)), _ts(s), _ts(s + int(rng.randint(0, 60))), j))
    p = spark.createDataFrame(points, ["user_id", "ts", "point_id"])
    iv = spark.createDataFrame(intervals, ["user_id", "started", "ended", "iv_id"])
    expected = _brute(points, intervals)
    # the answer must be invariant to bin width (tiny, typical, huge)
    for bin_seconds in (60, 3600, 10**7):
        got = sorted(
            (r.user_id, r.ts, r.point_id, r.iv_id)
            for r in interval_join(p, iv, bin_seconds=bin_seconds).collect()
        )
        assert got == expected, f"bin_seconds={bin_seconds}"


def test_inclusive_edges_and_no_dup(spark):
    from pyld_spark.operators.intervals import interval_join

    p = spark.createDataFrame(
        [(1, _ts(10), "at_start"), (1, _ts(20), "at_end"),
         (1, _ts(15), "inside"), (1, _ts(21), "outside")],
        ["user_id", "ts", "tag"])
    iv = spark.createDataFrame(
        [(1, _ts(10), _ts(20), 99)], ["user_id", "started", "ended", "iv_id"])
    # bin width smaller than the interval: the interval spans several bins,
    # yet each match must appear exactly once
    rows = interval_join(p, iv, bin_seconds=120).collect()
    assert sorted(r.tag for r in rows) == ["at_end", "at_start", "inside"]
    assert all(r.iv_id == 99 for r in rows)


def test_numeric_axis(spark):
    from pyld_spark.operators.intervals import interval_join

    p = spark.createDataFrame([(1, 5.0, "a"), (1, 50.0, "b")],
                              ["user_id", "ts", "tag"])
    iv = spark.createDataFrame([(1, 0.0, 10.0, 1)],
                               ["user_id", "started", "ended", "iv_id"])
    rows = interval_join(p, iv, bin_seconds=3).collect()
    assert [r.tag for r in rows] == ["a"]


def test_collision_and_bad_args(spark):
    from pyld_spark.operators.intervals import interval_join

    p = spark.createDataFrame([(1, _ts(0), 1)], ["user_id", "ts", "iv_id"])
    iv = spark.createDataFrame([(1, _ts(0), _ts(1), 2)],
                               ["user_id", "started", "ended", "iv_id"])
    with pytest.raises(ValueError, match="collide"):
        interval_join(p, iv)
    with pytest.raises(ValueError, match="positive"):
        interval_join(p, iv, interval_cols=(), bin_seconds=0)


def test_plan_is_equi_join_no_nested_loop(spark):
    from pyld_spark.operators.intervals import interval_join

    p = spark.createDataFrame([(1, _ts(0), "a")], ["user_id", "ts", "tag"])
    iv = spark.createDataFrame([(1, _ts(0), _ts(1), 2)],
                               ["user_id", "started", "ended", "iv_id"])
    plan = interval_join(p, iv)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_long_interval_guard(spark):
    from pyld_spark.operators.intervals import interval_join

    p = spark.createDataFrame([(1, _ts(5), "a")], ["user_id", "ts", "tag"])
    # a ~70-day interval at 60 s bins = ~100k bins > the 1k guard
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(100_000), 1)], ["user_id", "started", "ended", "iv_id"])
    with pytest.raises(Exception, match="spans more than"):
        interval_join(p, iv, bin_seconds=60,
                      max_bins_per_interval=1000).collect()
    # same data passes with a wide-enough bin
    rows = interval_join(p, iv, bin_seconds=86400 * 7,
                         max_bins_per_interval=1000).collect()
    assert len(rows) == 1
