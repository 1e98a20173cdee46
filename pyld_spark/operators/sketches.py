"""Mergeable distinct-count sketches: K-Minimum-Values (KMV) as pure
dataflow — a deterministic, SQL-replayable alternative to HyperLogLog.

``approx_count_distinct`` (Spark) and ``approx_count_distinct`` (DuckDB)
are both HLL but with different hash functions and register layouts, so
their outputs can never be cross-checked. KMV (Bar-Yossef et al. 2002)
estimates distinct counts from the k smallest values of a uniform hash:
if the k-th smallest normalized hash is ``f``, the estimate is
``(k-1)/f``; when fewer than k distinct hashes exist the sketch holds
every one and the count is exact. With a deterministic hash (md5-derived
48-bit integers here — md5 exists in every engine) the whole sketch is a
plain Spark plan that a DuckDB oracle replays bit-for-bit.

Scale shape: groupBy (keys…, hash) with map-side partial aggregation
collapses duplicate values before the shuffle, then the ``rank <= k`` cut
compiles to Spark's two-phase WindowGroupLimit (each map task forwards at
most k rows per group), then a k-row-per-group aggregate. Nothing
resident anywhere but k hashes per group; error is the standard KMV
~1/sqrt(k-2) (k=256 → ~6%).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash width: 12 hex chars = 48 bits — fits a BIGINT in both engines
#: (DuckDB parses it via CAST('0x…' AS BIGINT)), collision-negligible
#: far beyond gate scales
HASH_BITS = 48
_HASH_SPACE = float(2 ** HASH_BITS)


def h48(col: Column, salt: str = "") -> Column:
    """Deterministic 48-bit uniform hash of a column (md5 prefix)."""
    s = col.cast("string") if not salt else F.concat(F.lit(salt), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    by: tuple[str, ...] = (),
    k: int = 256,
) -> DataFrame:
    """Per-group distinct-count sketch of ``value_col``. Output columns:
    the ``by`` keys, ``n_hashes`` (min(k, #distinct) — the sketch fill),
    ``kth_hash`` (the largest retained hash, i.e. the k-th minimum), and
    ``est_distinct`` (exact when the sketch isn't full, else (k-1)/f_k,
    rounded to 4 decimals)."""
    if k < 2:
        raise ValueError("kmv_distinct needs k >= 2")

    hashed = (
        df.select(*by, h48(F.col(value_col)).alias("_h"))
        .groupBy(*by, "_h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy(*by).orderBy(F.col("_h").asc())
    kept = (
        hashed
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
    )
    est = (
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.max("_h").cast("double")
    )
    return (
        kept.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.max("_h").alias("kth_hash"),
            F.round(
                F.when(F.count(F.lit(1)) < k,
                       F.count(F.lit(1)).cast("double")).otherwise(est),
                4,
            ).alias("est_distinct"),
        )
    )


def kmv_merge(sketches: DataFrame, by: tuple[str, ...] = (), k: int = 256) -> DataFrame:
    """Merge per-group KMV sketches (rows of retained hashes, column
    ``_h``) down to coarser groups — the mergeability that makes KMV a
    sketch rather than a query: union the hash sets, keep the k smallest.
    Input: (…, _h) rows as produced by the ``kept`` stage; output has the
    same schema as :func:`kmv_distinct`."""
    w = Window.partitionBy(*by).orderBy(F.col("_h").asc())
    kept = (
        sketches.select(*by, "_h").distinct()
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
    )
    est = (
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.max("_h").cast("double")
    )
    return (
        kept.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.max("_h").alias("kth_hash"),
            F.round(
                F.when(F.count(F.lit(1)) < k,
                       F.count(F.lit(1)).cast("double")).otherwise(est),
                4,
            ).alias("est_distinct"),
        )
    )


def kmv_hashes(
    df: DataFrame,
    value_col: str,
    by: tuple[str, ...] = (),
    k: int = 256,
) -> DataFrame:
    """The raw retained-hash rows (…, _h) — feed to :func:`kmv_merge` to
    roll sketches up to coarser groupings without re-reading the data."""
    hashed = (
        df.select(*by, h48(F.col(value_col)).alias("_h"))
        .groupBy(*by, "_h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy(*by).orderBy(F.col("_h").asc())
    return (
        hashed.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select(*by, "_h")
    )
