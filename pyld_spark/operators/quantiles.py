"""Exact distributed quantiles via two-pass binning — the scale-correct
alternative to both a global sort (one giant range exchange at 100 TB) and
``approx_percentile`` (whose GK sketch can never be cross-checked against
another engine).

Classic two-pass exact selection (Blum et al. selection networks adapted to
MapReduce; the same shape DBs use for exact percentile pushdown):

1. **Bin pass** — one aggregation computes per-group ``(n, min, max)``, then
   one shuffle on ``(group, bin)`` counts rows per fixed-width bin. All bin
   arithmetic is BIGINT (integer axes only), so bin boundaries are exact and
   engine-independent.
2. **Locate** — a window over the tiny per-group bin histogram (≤ n_bins
   rows per group) turns each requested quantile ``q`` into ``(target bin,
   rank offset within bin)``: the global rank is ``r = ceil(q*n)`` (the
   discrete lower quantile — the value at sorted position r, never an
   interpolation, so the result is an actual data value).
3. **Select pass** — rows are semi-joined (broadcast: |groups|·|qs| rows)
   to their target bins and ``row_number`` ordered by value picks the exact
   offset. Only ~``|qs|/n_bins`` of the data survives the filter, so the
   second shuffle is a sliver of the corpus; partitions are bounded at
   ~``n/n_bins`` rows regardless of corpus size.

Ties are harmless: ``row_number`` among equal values is arbitrary, but the
VALUE at sorted position r is deterministic. The whole computation is plain
integer dataflow, replayable bit-for-bit by a DuckDB window oracle.

Reference analogue: none (training-data pipeline axis — corpus length/score
distribution reporting at scales where a sort or a driver collect is
impossible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    by: tuple[str, ...] = (),
    n_bins: int = 4096,
    refine_passes: int = 1,
) -> DataFrame:
    """Exact per-group quantiles of an integral column.

    Output columns: the ``by`` keys, ``q`` (double), ``rank`` (the 1-based
    global rank ceil(q*n) that defines the quantile), and ``value`` (the
    exact value at that rank — a real data value, BIGINT).

    ``value_col`` must be integral (lengths, counts, integer micros);
    exactness of the bin arithmetic depends on it.

    ``refine_passes`` re-bins the surviving target-bin rows before the
    final in-bin sort: each pass shrinks the candidate set another
    ~n_bins× (one cheap aggregation over the sliver + a broadcast
    semi-join), so the final row_number partition is bounded at
    ~n/n_bins^(1+refine_passes) rows.  At 10^12 rows, one pass takes the
    worst sort partition from ~2.4e8 rows to ~6e4 — without it the
    single-partition sort is the one piece of this plan that does not
    survive a 100× scale-up.  Results are pass-count-invariant (tested).
    """
    if not qs:
        raise ValueError("exact_quantiles needs at least one quantile")
    if any(q <= 0.0 or q > 1.0 for q in qs):
        raise ValueError("quantiles must be in (0, 1]")
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    if refine_passes < 0:
        raise ValueError("refine_passes must be >= 0")

    by_cols = [F.col(c) for c in by]
    vals = df.select(*by, F.col(value_col).cast("bigint").alias("_v")).where(
        F.col("_v").isNotNull()
    )

    # Pass 1a: per-group extent. Tiny result (one row per group).
    extent = vals.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
    )

    # Bin id: floor((v - lo) * n_bins / (hi - lo + 1)), in [0, n_bins-1].
    # Width uses hi-lo+1 so hi itself lands in the last bin without a
    # clamp.  Spark's `/` is double division; correctness does NOT depend
    # on the quotient being exact, only on bin id being non-decreasing in
    # v — (v-lo) is exact BIGINT, and int→double conversion, positive
    # multiply, divide, and floor are each order-preserving, so bins are
    # contiguous runs of the sorted order even when rounding nudges a
    # boundary.  The same expression keys BOTH passes, so histogram and
    # selection always agree.
    ext_b = F.broadcast(extent)
    binned = vals.join(ext_b, list(by)) if by else vals.crossJoin(ext_b)
    bin_expr = ((F.col("_v") - F.col("_lo")) * n_bins / (
        F.col("_hi") - F.col("_lo") + F.lit(1)
    )).cast("bigint")

    # Pass 1b: per-(group, bin) counts — the one corpus-sized aggregation.
    hist = (
        binned.select(*by_cols, bin_expr.alias("_bin"))
        .groupBy(*by, "_bin")
        .agg(F.count(F.lit(1)).alias("_c"))
    )

    # Locate: cumulative counts over the (small) histogram, one row per
    # requested quantile per group.
    w = (
        Window.partitionBy(*by)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_prev", F.col("_cum") - F.col("_c")
    )
    q_rows = F.array(*[F.lit(float(q)) for q in sorted(qs)])
    targets = (
        cum.join(F.broadcast(extent.select(*by, "_n")), list(by))
        if by
        else cum.crossJoin(F.broadcast(extent.select("_n")))
    )
    targets = (
        targets.select(
            *by_cols,
            "_bin",
            "_prev",
            "_cum",
            F.explode(q_rows).alias("q"),
            F.col("_n"),
        )
        .withColumn("rank", F.ceil(F.col("q") * F.col("_n")).cast("bigint"))
        .withColumn("rank", F.greatest(F.col("rank"), F.lit(1)))
        .where((F.col("rank") > F.col("_prev")) & (F.col("rank") <= F.col("_cum")))
        .select(*by_cols, "_bin", "q", "rank", (F.col("rank") - F.col("_prev")).alias("_off"))
    )

    # Pass 2: only rows in target bins survive.  `cand` carries, per
    # (group, q), the candidate rows and the offset of the answer within
    # them (ordered by value).
    keyed = binned.select(*by_cols, "_v", bin_expr.alias("_bin"))
    cand = (
        keyed.join(F.broadcast(targets), [*by, "_bin"])
        .select(*by_cols, "q", "rank", "_off", "_v")
    )

    # Refinement: re-bin the surviving sliver over ITS OWN observed value
    # range (an exact agg, immune to the float-rounding fuzz of analytic
    # bin boundaries) and keep only the sub-bin containing the offset —
    # the same locate logic one level down, on ~1/n_bins of the rows.
    keys = [*by, "q"]
    for _ in range(refine_passes):
        sub_ext = cand.groupBy(*keys).agg(
            F.min("_v").alias("_slo"), F.max("_v").alias("_shi")
        )
        s = cand.join(F.broadcast(sub_ext), keys)
        sub_bin = ((F.col("_v") - F.col("_slo")) * n_bins / (
            F.col("_shi") - F.col("_slo") + F.lit(1)
        )).cast("bigint")
        s = s.withColumn("_sbin", sub_bin)
        hist2 = s.groupBy(*keys, "_sbin").agg(F.count(F.lit(1)).alias("_c"))
        w_loc = (
            Window.partitionBy(*keys)
            .orderBy("_sbin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum2 = hist2.withColumn("_cum", F.sum("_c").over(w_loc)).withColumn(
            "_prev", F.col("_cum") - F.col("_c")
        )
        # _off is constant per (group, q) — one target (sub-)bin survives
        # each pass, so min() is just a carrier
        offs = cand.groupBy(*keys).agg(F.min("_off").alias("_off"))
        tgt2 = (
            cum2.join(F.broadcast(offs), keys)
            .where(
                (F.col("_off") > F.col("_prev"))
                & (F.col("_off") <= F.col("_cum"))
            )
            .select(
                *[F.col(k) for k in keys],
                "_sbin",
                (F.col("_off") - F.col("_prev")).alias("_noff"),
            )
        )
        cand = s.join(F.broadcast(tgt2), [*keys, "_sbin"]).select(
            *by_cols, "q", "rank", F.col("_noff").alias("_off"), "_v"
        )

    # Final pick: the candidate set holds one (sub-)bin per (group, q), so
    # this window partition is the bounded sliver, never the corpus.
    w2 = Window.partitionBy(*keys).orderBy("_v")
    out = (
        cand.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") == F.col("_off"))
        .select(*by_cols, "q", "rank", F.col("_v").alias("value"))
    )
    return out
