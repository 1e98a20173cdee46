"""As-of join (operators/temporal.py) vs pandas merge_asof and hand-built
edge cases."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

T0 = datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def _frames(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, ["user_id", "ts", "l_val"])
    r = spark.createDataFrame(right_rows, ["user_id", "ts", "event_id", "r_val"])
    return l, r


def test_backward_matches_pandas_merge_asof(spark):
    from pyld_spark.operators.temporal import asof_join

    import numpy as np
    rng = np.random.RandomState(42)
    left_rows = [
        (int(rng.randint(0, 5)), _ts(int(rng.randint(0, 500))), f"l{i}")
        for i in range(80)
    ]
    right_rows = [
        (int(rng.randint(0, 5)), _ts(int(rng.randint(0, 500))), i, f"r{i}")
        for i in range(60)
    ]
    # pandas merge_asof requires unique sort keys per group for a
    # deterministic answer; our generator can duplicate (user, ts) on the
    # right — drop to the max event_id, the operator's tie rule
    l, r = _frames(spark, left_rows, right_rows)
    out = asof_join(l, r, by=("user_id",), tie_col="event_id",
                    suffix="_prior").collect()

    lp = pd.DataFrame(left_rows, columns=["user_id", "ts", "l_val"])
    rp = (
        pd.DataFrame(right_rows, columns=["user_id", "ts", "event_id", "r_val"])
        .sort_values(["user_id", "ts", "event_id"])
        .groupby(["user_id", "ts"], as_index=False).last()
    )
    exp = pd.merge_asof(
        lp.sort_values("ts", kind="stable"),
        rp.sort_values("ts", kind="stable"),
        on="ts", by="user_id", direction="backward", suffixes=("", "_prior"),
    )
    exp_map = {
        (row.user_id, row.l_val): (
            None if pd.isna(row.event_id) else int(row.event_id))
        for row in exp.itertuples()
    }
    got_map = {(r2.user_id, r2.l_val): r2.event_id_prior for r2 in out}
    assert got_map == exp_map
    # matched timestamp is the right row's ts
    rts = {(u, e): t for (u, t, e, _) in right_rows}
    for row in out:
        if row.event_id_prior is not None:
            assert row.ts_prior == rts[(row.user_id, row.event_id_prior)]
            assert row.ts_prior <= row.ts
        else:
            assert row.ts_prior is None


def test_equal_ts_inclusive_and_tie_break(spark):
    from pyld_spark.operators.temporal import asof_join

    l, r = _frames(
        spark,
        [(1, _ts(10), "a")],
        [(1, _ts(10), 7, "x"), (1, _ts(10), 9, "y"), (1, _ts(5), 1, "old")],
    )
    row, = asof_join(l, r, tie_col="event_id").collect()
    # inclusive at equal ts; max event_id wins the tie
    assert row.event_id_asof == 9 and row.r_val_asof == "y"


def test_no_candidate_keeps_left_row(spark):
    from pyld_spark.operators.temporal import asof_join

    l, r = _frames(
        spark,
        [(1, _ts(1), "early"), (2, _ts(100), "other_user")],
        [(1, _ts(50), 3, "late")],
    )
    out = {row.l_val: row for row in asof_join(l, r, tie_col="event_id").collect()}
    assert len(out) == 2
    assert out["early"].event_id_asof is None
    assert out["other_user"].event_id_asof is None


def test_forward_direction(spark):
    from pyld_spark.operators.temporal import asof_join

    l, r = _frames(
        spark,
        [(1, _ts(10), "a"), (1, _ts(60), "b")],
        [(1, _ts(20), 1, "x"), (1, _ts(30), 2, "y")],
    )
    out = {row.l_val: row for row in
           asof_join(l, r, tie_col="event_id", direction="forward").collect()}
    assert out["a"].event_id_asof == 1  # nearest at-or-after
    assert out["b"].event_id_asof is None


def test_tolerance_nulls_stale_matches(spark):
    from pyld_spark.operators.temporal import asof_join

    l, r = _frames(
        spark,
        [(1, _ts(10), "near"), (1, _ts(500), "far")],
        [(1, _ts(8), 1, "x")],
    )
    out = {row.l_val: row for row in
           asof_join(l, r, tie_col="event_id",
                     tolerance_seconds=600).collect()}
    assert out["near"].event_id_asof == 1
    assert out["far"].event_id_asof is None and out["far"].ts_asof is None


def test_bad_args(spark):
    from pyld_spark.operators.temporal import asof_join

    l, r = _frames(spark, [(1, _ts(0), "a")], [(1, _ts(0), 1, "x")])
    with pytest.raises(ValueError):
        asof_join(l, r, by=())
    with pytest.raises(ValueError):
        asof_join(l, r, direction="nearest")


def test_plan_is_single_exchange_no_join(spark):
    from pyld_spark.operators.temporal import asof_join

    l, r = _frames(spark, [(1, _ts(0), "a")], [(1, _ts(0), 1, "x")])
    plan = asof_join(l, r, tie_col="event_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_equal_ts_tie_largest_wins_both_directions(spark):
    # Two right rows at exactly the left row's timestamp: the largest
    # tie_col wins in BOTH directions (regression — forward used to pick
    # the smallest).
    from pyld_spark.operators.temporal import asof_join

    l, r = _frames(
        spark,
        [(1, _ts(10), "a")],
        [(1, _ts(10), 1, "x"), (1, _ts(10), 2, "y")],
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            l, r, tie_col="event_id", direction=direction
        ).collect()
        assert out[0].event_id_asof == 2, direction
