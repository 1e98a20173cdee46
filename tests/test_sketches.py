"""KMV distinct-count sketch (operators/sketches.py): exact-path
equality, estimation error bounds, mergeability, plan shape."""

from __future__ import annotations

import hashlib

import pytest


def _h48(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)


def test_exact_when_sketch_not_full(spark):
    from pyld_spark.operators.sketches import kmv_distinct

    rows = [(g, v) for g in ("a", "b") for v in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = {r.grp: r for r in kmv_distinct(df, "val", by=("grp",), k=64).collect()}
    for g in ("a", "b"):
        assert out[g].n_hashes == 10
        assert out[g].est_distinct == 10.0


def test_kth_hash_matches_python_replay(spark):
    from pyld_spark.operators.sketches import kmv_distinct

    vals = list(range(500))
    df = spark.createDataFrame([(v,) for v in vals], ["val"])
    row, = kmv_distinct(df, "val", k=32).collect()
    hs = sorted({_h48(v) for v in vals})
    assert row.n_hashes == 32
    assert row.kth_hash == hs[31]
    expected = round(31 * 2.0**48 / hs[31], 4)
    assert row.est_distinct == expected


def test_estimation_error_within_bounds(spark):
    from pyld_spark.operators.sketches import kmv_distinct

    n = 20000
    df = spark.createDataFrame([(i,) for i in range(n)], ["val"])
    row, = kmv_distinct(df, "val", k=256).collect()
    # KMV std err ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row.est_distinct - n) / n < 0.25


def test_merge_equals_direct_sketch(spark):
    from pyld_spark.operators.sketches import kmv_distinct, kmv_hashes, kmv_merge

    rows = [(f"g{i % 4}", i % 3000) for i in range(9000)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    # fine sketches per grp, merged to a single global sketch
    fine = kmv_hashes(df, "val", by=("grp",), k=128)
    merged, = kmv_merge(fine, by=(), k=128).collect()
    direct, = kmv_distinct(df, "val", k=128).collect()
    assert merged.kth_hash == direct.kth_hash
    assert merged.est_distinct == direct.est_distinct


def test_duplicates_do_not_inflate(spark):
    from pyld_spark.operators.sketches import kmv_distinct

    df1 = spark.createDataFrame([(v,) for v in range(1000)], ["val"])
    df2 = spark.createDataFrame([(v,) for v in range(1000) for _ in range(5)],
                                ["val"])
    r1, = kmv_distinct(df1, "val", k=64).collect()
    r2, = kmv_distinct(df2, "val", k=64).collect()
    assert (r1.kth_hash, r1.est_distinct) == (r2.kth_hash, r2.est_distinct)


def test_bad_k(spark):
    from pyld_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([(1,)], ["val"])
    with pytest.raises(ValueError):
        kmv_distinct(df, "val", k=1)


def test_plan_uses_window_group_limit(spark):
    from pyld_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([("a", 1)], ["grp", "val"])
    plan = kmv_distinct(df, "val", by=("grp",), k=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
