"""Deterministic sampling/split operators (operators/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest

from pyld_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
)

WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _df(spark, n=2000):
    return spark.range(n).selectExpr(
        "CAST(id AS STRING) AS key",
        "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'es' "
        "ELSE 'zh' END AS lang",
    )


def _py_bucket(key, salt):
    return hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8]


def test_hash_split_matches_row_local_oracle_and_proportions(spark):
    rows = hash_split(_df(spark), "key", WEIGHTS).collect()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        # row-local oracle: recompute the assignment in pure Python
        b = _py_bucket(r["key"], "split")
        expected = (
            "train" if b < format(int(0.9 * 16**8), "08x")
            else "val" if b < format(int(0.95 * 16**8), "08x")
            else "test"
        )
        assert r["split"] == expected
    assert counts["train"] == pytest.approx(1800, rel=0.05)
    assert counts["val"] + counts["test"] == pytest.approx(200, rel=0.3)


def test_hash_split_stable_under_partitioning_and_growth(spark):
    full = {
        r["key"]: r["split"]
        for r in hash_split(_df(spark, 2000).repartition(13), "key", WEIGHTS).collect()
    }
    subset = {
        r["key"]: r["split"]
        for r in hash_split(_df(spark, 500), "key", WEIGHTS).collect()
    }
    # a document's split never changes when the corpus grows
    assert subset == {k: v for k, v in full.items() if int(k) < 500}


def test_hash_split_validates_weights(spark):
    df = _df(spark, 10)
    with pytest.raises(ValueError):
        hash_split(df, "key", {})
    with pytest.raises(ValueError):
        hash_split(df, "key", {"a": 0.5, "b": 0.6})


def test_deterministic_sample_edges_and_alignment(spark):
    df = _df(spark)
    assert deterministic_sample(df, "key", 1.0).count() == 2000
    assert deterministic_sample(df, "key", 0.0).count() == 0
    kept = deterministic_sample(df, "key", 0.3).collect()
    assert len(kept) == pytest.approx(600, rel=0.15)
    # alignment: another table sharing the key keeps exactly the same keys
    other = spark.range(2000).selectExpr("CAST(id AS STRING) AS key", "id * 2 AS v")
    kept_other = deterministic_sample(other, "key", 0.3).collect()
    assert {r["key"] for r in kept} == {r["key"] for r in kept_other}


def test_stratified_sample_per_stratum_fractions(spark):
    out = stratified_sample(
        _df(spark, 3000), "key", "lang",
        {"en": 1.0, "es": 0.5}, default_fraction=0.0,
    ).collect()
    by_lang = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert by_lang.get("en") == 1000          # fraction 1.0: every row kept
    assert by_lang.get("es") == pytest.approx(500, rel=0.15)
    assert "zh" not in by_lang                # default 0.0: none kept
