"""Range (point-in-interval) join via bin bucketing — the second custom
temporal operator Spark lacks natively (see also temporal.asof_join).

A naive point-in-interval join is a theta join (``start <= ts AND
ts <= end``): Spark plans a broadcast-nested-loop or a cartesian per key
— O(|P|·|I|) and a scale-killer. The standard distributed encoding used
here: pick a bin width, explode every interval into the bins it covers,
map every point to its single bin, and equi-join on (keys…, bin) with the
exact range predicate as a post-filter. Each qualifying (point, interval)
pair meets in EXACTLY one bin — the point's — so no dedup pass is needed.

Scale properties:

* a plain shuffled hash equi-join on (by…, bin) — partial-agg/broadcast/
  AQE-skew machinery all apply as usual;
* cost is linear: |P| + Σ_intervals (duration / bin_seconds + 1) join
  input rows. Pick ``bin_seconds`` near the typical interval length —
  too small explodes long intervals into many bins, too large piles
  unrelated rows into one bucket before the filter;
* exact integer-microsecond bin + range arithmetic for timestamps (no
  double rounding at interval edges); plain doubles for numeric axes.

Both ends inclusive (``start <= ts <= end``), matching SQL BETWEEN — the
DuckDB gate oracle replays the whole thing as a BETWEEN theta join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _axis_num(df: DataFrame, col: str) -> "tuple":
    """(numeric expression, is_timestamp) for a range-axis column."""
    if isinstance(df.schema[col].dataType, (TimestampType, TimestampNTZType)):
        return F.unix_micros(F.col(col).cast("timestamp")), True
    return F.col(col).cast("double"), False


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "started",
    end_col: str = "ended",
    by: tuple[str, ...] = ("user_id",),
    bin_seconds: int = 3600,
    interval_cols: tuple[str, ...] | None = None,
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Inner-join each point row to every interval row (same ``by`` keys)
    whose ``[start_col, end_col]`` range contains its ``ts_col``. Output:
    all point columns + the requested interval payload columns.

    ``max_bins_per_interval`` is the mis-sizing guard: an interval
    spanning more than that many bins (a year-long interval at 1-second
    bins would explode into 3×10^7 rows — executor-killing amplification
    from ONE bad row) fails the job with a clear message instead of
    silently materializing the blow-up. Raise the limit or widen
    ``bin_seconds`` deliberately if such intervals are real.
    """
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    if max_bins_per_interval <= 0:
        raise ValueError("max_bins_per_interval must be positive")
    if interval_cols is None:
        skip = set(by) | {start_col, end_col}
        interval_cols = tuple(c for c in intervals.columns if c not in skip)
    clash = set(interval_cols) & set(points.columns)
    if clash:
        raise ValueError(
            f"interval payload columns collide with point columns: "
            f"{sorted(clash)}; rename or pass interval_cols")

    p_num, p_is_ts = _axis_num(points, ts_col)
    s_num, s_is_ts = _axis_num(intervals, start_col)
    e_num, _ = _axis_num(intervals, end_col)
    if p_is_ts != s_is_ts:
        raise ValueError("points and intervals must use the same axis type")
    width: Column = (
        F.lit(int(bin_seconds) * 1_000_000) if p_is_ts
        else F.lit(float(bin_seconds))
    )

    p = points.withColumn("_iv_num", p_num).withColumn(
        "_iv_bin", F.floor(F.col("_iv_num") / width))
    span_bins = (
        F.floor(F.col("_iv_end") / width) - F.floor(F.col("_iv_start") / width)
    )
    # the guard lives INSIDE the exploded expression (a separate guard
    # column would be dead code and pruned by Catalyst before it ran)
    bins = F.when(
        span_bins < F.lit(int(max_bins_per_interval)),
        F.sequence(
            F.floor(F.col("_iv_start") / width),
            F.floor(F.col("_iv_end") / width),
        ),
    ).otherwise(
        F.raise_error(F.concat(
            F.lit(
                f"interval_join: an interval spans more than "
                f"{max_bins_per_interval} bins of {bin_seconds}s — widen "
                f"bin_seconds or raise max_bins_per_interval (interval "
                f"start micros/value: "),
            F.col("_iv_start").cast("string"), F.lit(")"),
        )).cast("array<bigint>")
    )
    i = (
        intervals
        .withColumn("_iv_start", s_num)
        .withColumn("_iv_end", e_num)
        .withColumn("_iv_bin", F.explode(bins))
        .select(*by, "_iv_bin", "_iv_start", "_iv_end", *interval_cols)
    )

    joined = p.join(i, [*by, "_iv_bin"]).filter(
        (F.col("_iv_num") >= F.col("_iv_start"))
        & (F.col("_iv_num") <= F.col("_iv_end"))
    )
    return joined.select(*points.columns, *interval_cols)
