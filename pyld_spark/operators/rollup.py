"""Hypertable-style continuous aggregate: multi-granularity time rollups
where each coarser level re-aggregates the next finer level, never the
raw data.

The TimescaleDB/Druid pattern: a 100-TB event table is scanned ONCE to
build the finest grain (one corpus-sized shuffle); hour re-aggregates
minute rows, day re-aggregates hour rows — inputs shrink by orders of
magnitude per level, so every level past the first is near-free. That
only works for decomposable aggregates; this operator carries the
standard mergeable set (count, sum, min, max — mean derives as sum/count
at read time; distinct counts would ride along as KMV sketches from
operators/sketches.py, merged with kmv_merge).

Determinism: counts and min/max are exact; ``sum_value`` re-aggregates
partial double sums in a different order than a flat scan would, so it is
rounded to 4 decimals for the gate (absolute reassociation error at gate
magnitudes is ~1e-10 — far below the grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: supported grains, finest → coarsest (each must truncate-nest into the next)
GRAINS = ("minute", "hour", "day", "week", "month", "year")


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    grains: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Union of per-grain aggregates: (grain, bucket, dims…, n_events,
    sum_value, min_value, max_value). ``grains`` must be ordered finest
    first and each grain must nest into the next (all of GRAINS do)."""
    order = {g: i for i, g in enumerate(GRAINS)}
    if not grains:
        raise ValueError("grains must be non-empty")
    bad = [g for g in grains if g not in order]
    if bad:
        raise ValueError(f"unknown grains {bad}; supported: {GRAINS}")
    if list(grains) != sorted(grains, key=order.__getitem__):
        raise ValueError("grains must be ordered finest -> coarsest")

    finest = grains[0]
    level = (
        events
        .groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *dims)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("_sum"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    if len(grains) > 1:
        # the whole point of the cascade is ONE raw scan: without lineage
        # truncation Catalyst re-derives the finest aggregate from the
        # source inside every union branch (verified: 3 FileScans for 3
        # grains, zero exchange reuse). The finest level is bucket-grain
        # sized — tiny next to the corpus — so a lazy localCheckpoint is
        # cheap and every coarser level re-aggregates it.
        level = level.localCheckpoint(eager=False)
    out = [level.select(F.lit(finest).alias("grain"), "*")]
    for grain in grains[1:]:
        level = (
            level
            .groupBy(
                F.date_trunc(grain, F.col("bucket")).alias("bucket"), *dims)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_sum").alias("_sum"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        out.append(level.select(F.lit(grain).alias("grain"), "*"))

    unioned = out[0]
    for o in out[1:]:
        unioned = unioned.unionByName(o)
    return unioned.select(
        "grain", "bucket", *dims, "n_events",
        F.round(F.col("_sum"), 4).alias("sum_value"),
        "min_value", "max_value",
    )
