"""Cascading time rollup (operators/rollup.py) vs per-grain flat
aggregation and hand-built fixtures."""

from __future__ import annotations

from datetime import datetime

import pytest

ROWS = [
    # (ts, event_type, value)
    (datetime(2024, 3, 1, 10, 0, 10), "click", 1.0),
    (datetime(2024, 3, 1, 10, 0, 50), "click", 2.5),
    (datetime(2024, 3, 1, 10, 59, 0), "click", -1.0),
    (datetime(2024, 3, 1, 11, 0, 0), "click", 4.0),
    (datetime(2024, 3, 2, 0, 0, 0), "click", 10.0),
    (datetime(2024, 3, 1, 10, 0, 20), "view", 7.0),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["ts", "event_type", "value"])


def test_minute_hour_day_counts(spark):
    from pyld_spark.operators.rollup import time_rollup

    out = time_rollup(_df(spark)).collect()
    by = {(r.grain, str(r.bucket), r.event_type): r for r in out}
    m = by[("minute", "2024-03-01 10:00:00", "click")]
    assert m.n_events == 2 and m.sum_value == 3.5
    assert m.min_value == 1.0 and m.max_value == 2.5
    h = by[("hour", "2024-03-01 10:00:00", "click")]
    assert h.n_events == 3 and h.sum_value == 2.5 and h.min_value == -1.0
    d = by[("day", "2024-03-01 00:00:00", "click")]
    assert d.n_events == 4 and d.sum_value == 6.5 and d.max_value == 4.0
    d2 = by[("day", "2024-03-02 00:00:00", "click")]
    assert d2.n_events == 1 and d2.sum_value == 10.0
    v = by[("minute", "2024-03-01 10:00:00", "view")]
    assert v.n_events == 1 and v.sum_value == 7.0


def test_cascade_equals_flat_aggregation(spark):
    from pyspark.sql import functions as F

    from pyld_spark.operators.rollup import time_rollup

    df = _df(spark)
    out = time_rollup(df, grains=("minute", "hour", "day")).collect()
    for grain in ("minute", "hour", "day"):
        got = sorted(
            (str(r.bucket), r.event_type, r.n_events, r.sum_value,
             r.min_value, r.max_value)
            for r in out if r.grain == grain)
        flat = sorted(
            (str(r.bucket), r.event_type, r.n_events, r.sum_value,
             r.min_value, r.max_value)
            for r in df.groupBy(
                F.date_trunc(grain, "ts").alias("bucket"), "event_type"
            ).agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            ).collect())
        assert got == flat, grain


def test_single_scan_of_input(spark, sf_dir, tmp_path):
    # the raw table must be scanned exactly once — coarse grains
    # re-aggregate the finer level, not the data (without the lineage
    # truncation Catalyst plans 3 FileScans for 3 grains)
    from pyld_spark.operators.rollup import time_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = time_rollup(ev)._jdf.queryExecution().executedPlan().toString()
    # every grain branch reads the checkpointed finest level; the one raw
    # FileScan lives inside the checkpoint's own (single) job
    assert plan.count("FileScan parquet") == 0
    assert plan.count("Scan ExistingRDD") == 3


def test_grain_validation(spark):
    from pyld_spark.operators.rollup import time_rollup

    df = _df(spark)
    with pytest.raises(ValueError, match="unknown"):
        time_rollup(df, grains=("minute", "fortnight"))
    with pytest.raises(ValueError, match="finest"):
        time_rollup(df, grains=("day", "minute"))
    with pytest.raises(ValueError, match="non-empty"):
        time_rollup(df, grains=())
