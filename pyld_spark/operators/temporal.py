"""Temporal alignment operators: a scalable as-of join (point-in-time
lookup) built from a union + one window — no join operator at all.

Spark has no native ASOF JOIN (DuckDB and Pandas do). The naive encodings
are both scale-killers: a range join (``l.ts >= r.ts`` theta join) is
O(|L|·|R|) per key, and a per-left-row ``max(ts <= l.ts)`` subquery is a
self-join plus re-aggregation. The classic distributed formulation used
here instead: tag both inputs, UNION them, sort each key group once by
(ts, tag), and carry the most recent right-side payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding running frame.

Scale properties (the 100-TB shapes):

* exactly ONE exchange, on the `by` keys, shared by both inputs; the
  window sort streams each key group — no buffering beyond Spark's sort
  machinery, no join build side, nothing resident per key but the single
  carried payload struct;
* skewed keys degrade to a bigger external sort group, never to a
  quadratic pair blow-up (contrast the range-join encoding);
* entirely JVM-side column expressions — no Python in the path.

Semantics match DuckDB/pandas ``direction='backward'|'forward'``
inclusive as-of: for each left row, the right row with the greatest
``ts <= left.ts`` (backward) or smallest ``ts >= left.ts`` (forward) in
the same key group; left rows with no candidate keep NULL payload (left
join). At equal timestamps the right row is visible to the left row
(inclusive); among multiple right rows sharing one (key, ts) the one with
the greatest ``tie_col`` wins (backward; smallest under forward) — pass a
unique tie_col for a deterministic result. ``tolerance_seconds`` nulls
out matches further than the bound, like pandas ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: tuple[str, ...] | None = None,
    tie_col: str | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its ``ts_col`` within the
    same ``by`` group. Right payload columns come back as
    ``<name><suffix>``; the matched right timestamp as ``<ts_col><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if not by:
        raise ValueError("asof_join requires at least one `by` key")
    if right_cols is None:
        keyed = set(by) | {ts_col}
        right_cols = tuple(c for c in right.columns if c not in keyed)

    payload = F.struct(
        F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(c) for c in right_cols],
    ).alias("_asof_payload")
    tie: Column = F.col(tie_col) if tie_col is not None else F.lit(0)

    left_cols = left.columns
    r_side = right.select(
        *[F.col(k) for k in by],
        F.col(ts_col).alias("_asof_ts"),
        F.lit(0).alias("_asof_tag"),
        tie.alias("_asof_tie"),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in by and c != ts_col],
    )
    l_side = left.select(
        *[F.col(k) for k in by],
        F.col(ts_col).alias("_asof_ts"),
        F.lit(1).alias("_asof_tag"),
        F.lit(None).cast(r_side.schema["_asof_tie"].dataType).alias("_asof_tie"),
        F.lit(None).cast(r_side.schema["_asof_payload"].dataType)
         .alias("_asof_payload"),
        *[F.col(c) for c in left_cols if c not in by and c != ts_col],
    )
    # column order must line up for unionByName-by-position semantics
    unioned = r_side.select(l_side.columns).unionByName(l_side)

    if direction == "backward":
        order = [F.col("_asof_ts").asc(), F.col("_asof_tag").asc(),
                 F.col("_asof_tie").asc()]
    else:
        # tie stays ASC even though ts flips: in both directions the
        # LAST right row the running `last()` sees at an equal timestamp
        # must be the largest tie_col, so largest-tie-wins is the contract
        # regardless of direction
        order = [F.col("_asof_ts").desc(), F.col("_asof_tag").asc(),
                 F.col("_asof_tie").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_asof_payload", ignorenulls=True).over(w)

    out = unioned.withColumn("_asof_hit", carried).filter(F.col("_asof_tag") == 1)

    hit_ts = F.col("_asof_hit")[ts_col]
    if tolerance_seconds is not None:
        # timestamps compare in exact integer microseconds (TIMESTAMP_NTZ
        # has no direct numeric cast in Spark 4, and integer arithmetic
        # sidesteps double rounding at the tolerance boundary)
        from pyspark.sql.types import TimestampNTZType, TimestampType

        if isinstance(left.schema[ts_col].dataType,
                      (TimestampType, TimestampNTZType)):
            def _num(c: Column) -> Column:
                return F.unix_micros(c.cast("timestamp"))
            bound = F.lit(int(round(tolerance_seconds * 1_000_000)))
        else:
            def _num(c: Column) -> Column:
                return c.cast("double")
            bound = F.lit(float(tolerance_seconds))
        gap = F.abs(_num(F.col("_asof_ts")) - _num(hit_ts))
        out = out.withColumn(
            "_asof_hit", F.when(gap <= bound, F.col("_asof_hit"))
        )
        hit_ts = F.col("_asof_hit")[ts_col]

    return out.select(
        *by,
        F.col("_asof_ts").alias(ts_col),
        *[F.col(c) for c in left_cols if c not in by and c != ts_col],
        hit_ts.alias(f"{ts_col}{suffix}"),
        *[F.col("_asof_hit")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
