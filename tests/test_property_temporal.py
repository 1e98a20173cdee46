"""Property-based differential tests for the temporal operators: random
event sets checked against exact pure-Python replays (both directions,
random tolerances, random bin widths)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

T0 = datetime(2024, 1, 1)

# (user, minutes, id) triples; small key/time spaces force collisions,
# equal timestamps, and empty groups
_points = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 10**6)),
    min_size=0, max_size=14, unique_by=lambda t: t[2],
)


def _py_asof(left, right, direction, tolerance):
    out = {}
    for (lu, lm, lid) in left:
        cands = [
            (rm, rid) for (ru, rm, rid) in right
            if ru == lu and (rm <= lm if direction == "backward" else rm >= lm)
        ]
        if direction == "backward":
            best = max(cands, key=lambda c: (c[0], c[1]), default=None)
        else:
            best = min(cands, key=lambda c: (c[0], -c[1]), default=None)
        if best is not None and tolerance is not None \
                and abs(lm - best[0]) * 60 > tolerance:
            best = None
        out[lid] = None if best is None else best[1]
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_points, _points, st.sampled_from(["backward", "forward"]),
       st.sampled_from([None, 0, 300, 600, 10**9]))
def test_asof_join_matches_python_replay(spark, left, right, direction, tol):
    from pyld_spark.operators.temporal import asof_join

    if not left:
        return
    l = spark.createDataFrame(
        [(u, T0 + timedelta(minutes=m), i) for (u, m, i) in left],
        ["user_id", "ts", "left_id"])
    r = spark.createDataFrame(
        [(u, T0 + timedelta(minutes=m), i) for (u, m, i) in right],
        ["user_id", "ts", "event_id"]) if right else spark.createDataFrame(
        [], "user_id int, ts timestamp, event_id long")
    got = {
        row.left_id: row.event_id_asof
        for row in asof_join(l, r, by=("user_id",), tie_col="event_id",
                             direction=direction,
                             tolerance_seconds=tol).collect()
    }
    assert got == _py_asof(left, right, direction, tol)


_intervals = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 25),
              st.integers(0, 10**6)),
    min_size=0, max_size=10, unique_by=lambda t: t[3],
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_points, _intervals, st.sampled_from([30, 300, 3600, 10**6]))
def test_interval_join_matches_brute_force(spark, points, intervals, bin_s):
    from pyld_spark.operators.intervals import interval_join

    if not points or not intervals:
        return
    p = spark.createDataFrame(
        [(u, T0 + timedelta(minutes=m), i) for (u, m, i) in points],
        ["user_id", "ts", "point_id"])
    iv = spark.createDataFrame(
        [(u, T0 + timedelta(minutes=s), T0 + timedelta(minutes=s + d), i)
         for (u, s, d, i) in intervals],
        ["user_id", "started", "ended", "iv_id"])
    got = sorted((r.point_id, r.iv_id)
                 for r in interval_join(p, iv, bin_seconds=bin_s).collect())
    expected = sorted(
        (pid, iid)
        for (pu, pm, pid) in points
        for (iu, s, d, iid) in intervals
        if pu == iu and s <= pm <= s + d
    )
    assert got == expected
