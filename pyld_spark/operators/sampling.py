"""Deterministic sampling and dataset splits for training-data pipelines.

A 100-TB corpus is never split with ``df.randomSplit`` (seed-and-
partitioning dependent: adding one file reshuffles every assignment) —
production pipelines derive the split from a HASH OF THE KEY, so:

- assignment is a pure function of (key, salt): stable across runs, engines,
  repartitions, and incremental ingests (a new document never moves an old
  one between splits);
- it needs no shuffle at all — a narrow projection at scan speed;
- holdout integrity survives dataset growth (the property auditors ask for).

The hash is the hex md5 of ``salt || ':' || key``: the first 8 hex chars are
a uniform draw from 16^8 buckets, compared LEXICOGRAPHICALLY against hex
thresholds. Pure string comparison keeps the exact same semantics in any
SQL engine (the DuckDB gate oracle replays it verbatim) with no
integer-conversion portability traps. xxhash64 variants (JVM-native, no
md5 cost) are the scale path when oracle portability is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET_HEX_CHARS = 8
_BUCKETS = 16**_BUCKET_HEX_CHARS


def _bucket_hex(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt:key) — a uniform label in [0, 16^8)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))),
        1,
        _BUCKET_HEX_CHARS,
    )


def _hex_threshold(fraction: float) -> str:
    """Largest bucket label assigned to a cumulative ``fraction`` of keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    n = int(fraction * _BUCKETS)
    if n >= _BUCKETS:
        return "g"  # lexicographically above every hex bucket label
    return format(n, f"0{_BUCKET_HEX_CHARS}x")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split with probability ~ its weight.

    Adds a ``split`` column. Weights must sum to 1 (±1e-9). Assignment is a
    pure row-local function of ``key_col`` — no shuffle, stable under
    repartitioning and dataset growth. Rows sharing a key land in the same
    split (use the dedup cluster id as the key to keep near-duplicates out
    of the holdout set).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = _bucket_hex(F.col(key_col), salt)
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable, shuffle-free,
    and consistent across tables sharing the key (sampling documents and
    their embeddings with the same salt keeps them aligned)."""
    return df.where(
        _bucket_hex(F.col(key_col), salt) < F.lit(_hex_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate-heavy
    languages, keep all rare ones). ``fractions`` maps stratum value →
    keep-fraction; strata not listed keep ``default_fraction``. Row-local,
    no shuffle, no per-stratum pass — one CASE expression."""
    bucket = _bucket_hex(F.col(key_col), salt)
    expr = None
    for value, frac in fractions.items():
        cond = F.col(stratum_col) == F.lit(value)
        thr = F.lit(_hex_threshold(frac))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    default_thr = F.lit(_hex_threshold(default_fraction))
    expr = default_thr if expr is None else expr.otherwise(default_thr)
    return df.where(bucket < expr)


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    by: tuple[str, ...] = (),
    salt: str = "priority",
) -> DataFrame:
    """Weighted sample of ``k`` rows per group with unbiased subset-sum
    estimation — priority sampling (Duffield, Lund & Thorup, JACM 54(6),
    2007).

    Each row draws ``u`` ~ Uniform(0,1] from its key hash and gets priority
    ``w/u``; the ``k`` highest priorities per group are kept, and every kept
    row carries ``weight_est = max(w, tau)`` where ``tau`` is the (k+1)-th
    priority.  ``sum(weight_est)`` over any subset of the sample is an
    unbiased estimator of that subset's true total weight — the property a
    100-TB pipeline needs to answer "how many tokens would this filter keep"
    from a fixed-size sample, with near-optimal variance (ibid., Thm 1).

    Exactness contract (what makes the DuckDB gate oracle hash-exact):
    ``u = (h48 + 1) * 2**-48`` scales a 48-bit md5 integer by a POWER OF
    TWO, so u is representable exactly, and ``w/u`` is one IEEE-correctly-
    rounded division — bit-identical in any engine; no ln/exp/pow whose
    libm rounding could differ (the usual Efraimidis-Spirakis ``u**(1/w)``
    key would not replay).  Ties are impossible for distinct keys (u is
    injective per key modulo md5 collisions) but ``key_col`` ASC breaks
    them deterministically anyway.

    Plan shape: ONE exchange on ``by`` shared by both windows; the
    ``rank <= k+1`` cut compiles to WindowGroupLimit so each partition
    retains k+1 rows map-side before the shuffle.

    Output: input columns plus ``priority``, ``weight_est``.  Rows with
    NULL or non-positive weight are excluded (zero-weight rows can never
    be sampled — DLT define priorities for w > 0), as are rows with a
    NULL key (a NULL hash would rank NULLS-FIRST in Spark but NULLS-LAST
    in other engines — same contract as :func:`cap_per_group`).
    """
    if k < 1:
        raise ValueError("priority_sample needs k >= 1")
    df = df.where(F.col(key_col).isNotNull())
    w = F.col(weight_col).cast("double")
    h48 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h48 + F.lit(1)).cast("double") * F.lit(2.0**-48)
    cand = df.where(w.isNotNull() & (w > 0)).withColumn("priority", w / u)
    order = [F.col("priority").desc(), F.col(key_col).asc()]
    w_rank = Window.partitionBy(*by).orderBy(*order)
    w_grp = Window.partitionBy(*by)
    ranked = (
        cand.withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") <= k + 1)
        .withColumn(
            "_tau",
            F.max(
                F.when(F.col("_rn") == k + 1, F.col("priority"))
            ).over(w_grp),
        )
    )
    return (
        ranked.where(F.col("_rn") <= k)
        .withColumn(
            "weight_est",
            F.greatest(w, F.coalesce(F.col("_tau"), F.lit(0.0))),
        )
        .drop("_rn", "_tau")
    )


def cap_per_group(
    df: DataFrame,
    key_col: str,
    by: tuple[str, ...],
    k: int,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``k`` rows per group — the web-pipeline "domain cap"
    (bound any one source's share of the corpus so a boilerplate-heavy
    host cannot dominate training data).

    Which k survive is a pure function of (key, salt): rows rank by
    ``md5(salt:key)`` hex (ties broken by key), so the kept set is stable
    across runs, engines, and repartitionings, and is an unbiased uniform
    choice within each group.  Growth-stability differs from the
    fraction-based samplers above BY DESIGN: a cap is a fixed budget, so
    new arrivals with smaller hashes legitimately displace old members.

    Plan: one exchange on ``by``; the rank cut compiles to
    WindowGroupLimit (each map task retains ≤ k rows per group before the
    shuffle), no Python.

    ``key_col`` must be non-null: a NULL key hashes to NULL and engines
    order NULLs differently (Spark ASC = NULLS FIRST, DuckDB = NULLS
    LAST), so rows with NULL keys are dropped rather than ranked
    ambiguously.
    """
    if k < 1:
        raise ValueError("cap_per_group needs k >= 1")
    if not by:
        raise ValueError("cap_per_group needs grouping keys")
    df = df.where(F.col(key_col).isNotNull())
    rank_hex = F.md5(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(*by).orderBy(rank_hex.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
