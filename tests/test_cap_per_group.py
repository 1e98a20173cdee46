"""Tests for sampling.cap_per_group (domain caps)."""

from __future__ import annotations

import hashlib
import random

from pyld_spark.operators.sampling import cap_per_group


def _replay(rows, key_i, by_i, k, salt="cap"):
    groups: dict = {}
    for r in rows:
        groups.setdefault(r[by_i], []).append(r)
    kept = []
    for g, items in groups.items():
        items.sort(key=lambda r: (
            hashlib.md5(f"{salt}:{r[key_i]}".encode()).hexdigest(),
            str(r[key_i]),
        ))
        kept += items[:k]
    return sorted(kept)


def test_matches_python_replay(spark):
    rng = random.Random(5)
    rows = [(f"d{i:03d}", rng.choice(["a.com", "b.org", "c.net"]))
            for i in range(150)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = sorted(
        (r["doc_id"], r["source"])
        for r in cap_per_group(df, "doc_id", ("source",), k=10).collect()
    )
    assert got == _replay(rows, 0, 1, 10)


def test_small_groups_keep_everything(spark):
    rows = [("x", "g1"), ("y", "g1"), ("z", "g2")]
    df = spark.createDataFrame(rows, ["k", "g"])
    got = cap_per_group(df, "k", ("g",), k=5).collect()
    assert len(got) == 3


def test_stable_under_repartition(spark):
    rows = [(f"d{i}", i % 4) for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "g"])
    a = sorted((r["g"], r["k"]) for r in cap_per_group(df, "k", ("g",), 7).collect())
    b = sorted(
        (r["g"], r["k"])
        for r in cap_per_group(df.repartition(11), "k", ("g",), 7).collect()
    )
    assert a == b


def test_plan_window_group_limit_no_python(spark):
    rows = [(f"d{i}", i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, ["k", "g"])
    plan = cap_per_group(df, "k", ("g",), 5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "PythonUDF" not in plan and "MapInPandas" not in plan


def test_null_keys_dropped(spark):
    rows = [("a", "g"), (None, "g"), ("b", "g")]
    df = spark.createDataFrame(rows, "k string, g string")
    got = cap_per_group(df, "k", ("g",), k=5).collect()
    assert sorted(r["k"] for r in got) == ["a", "b"]
