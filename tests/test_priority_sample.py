"""Differential + statistical tests for sampling.priority_sample.

The Python replay below recomputes the exact arithmetic contract (48-bit
md5 uniform, power-of-two scale, one IEEE division) — Spark must match it
bit-for-bit, which is the same property the DuckDB gate oracle relies on.
"""

from __future__ import annotations

import hashlib
import random

from pyld_spark.operators.sampling import priority_sample


def _replay(rows, key_i, w_i, k, by_i=None, salt="priority"):
    """Pure-Python priority sampling over (tuple) rows."""
    groups: dict = {}
    for r in rows:
        w = r[w_i]
        if w is None or w <= 0:
            continue
        g = r[by_i] if by_i is not None else None
        h = int(hashlib.md5(f"{salt}:{r[key_i]}".encode()).hexdigest()[:12], 16)
        u = float(h + 1) * 2.0**-48
        groups.setdefault(g, []).append((float(w) / u, r))
    out = {}
    for g, items in groups.items():
        items.sort(key=lambda t: (-t[0], t[1][key_i]))
        tau = items[k][0] if len(items) > k else 0.0
        out[g] = [
            (r[key_i], pri, max(float(r[w_i]), tau)) for pri, r in items[:k]
        ]
    return out


def test_matches_python_replay_bit_exact(spark):
    rng = random.Random(3)
    rows = [
        (f"d{i:04d}", rng.choice(["en", "fr", "de"]), rng.randint(1, 5000))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    got = priority_sample(df, "doc_id", "n_chars", k=7, by=("lang",)).collect()
    exp = _replay(rows, 0, 2, 7, by_i=1)
    got_by = {}
    for r in got:
        got_by.setdefault(r["lang"], []).append(
            (r["doc_id"], r["priority"], r["weight_est"])
        )
    for g in got_by:
        got_by[g].sort(key=lambda t: -t[1])
    assert got_by == exp  # exact float equality — the replay contract


def test_small_group_keeps_all_with_true_weights(spark):
    rows = [("a", 10), ("b", 20), ("c", 30)]
    df = spark.createDataFrame(rows, ["k", "w"])
    got = priority_sample(df, "k", "w", k=5).collect()
    assert sorted((r["k"], r["weight_est"]) for r in got) == [
        ("a", 10.0), ("b", 20.0), ("c", 30.0)
    ]


def test_nonpositive_and_null_weights_excluded(spark):
    rows = [("a", 10), ("b", 0), ("c", -3), ("d", None)]
    df = spark.createDataFrame(rows, "k string, w int")
    got = priority_sample(df, "k", "w", k=4).collect()
    assert [r["k"] for r in got] == ["a"]


def test_subset_sum_estimator_is_unbiased():
    # Duffield-Lund-Thorup Thm 1 via the replay: E[sum(weight_est)] over
    # the hash-salt ensemble equals the true total. Pure Python — the
    # Spark path is bit-identical to the replay by the test above.
    rng = random.Random(9)
    rows = [(f"x{i}", None, rng.randint(1, 100)) for i in range(60)]
    true_total = sum(r[2] for r in rows)
    k = 8
    ests = []
    for s in range(600):
        sample = _replay(rows, 0, 2, k, by_i=None, salt=f"s{s}")[None]
        ests.append(sum(e for _, _, e in sample))
    mean = sum(ests) / len(ests)
    # relative standard error at k=8 over 600 trials is a few percent
    assert abs(mean - true_total) / true_total < 0.05


def test_stable_under_repartition(spark):
    rows = [(f"d{i}", i % 3, (i * 7) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "g", "w"])
    a = priority_sample(df, "k", "w", k=5, by=("g",)).collect()
    b = priority_sample(df.repartition(13), "k", "w", k=5, by=("g",)).collect()
    key = lambda r: (r["g"], r["k"], r["priority"], r["weight_est"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_plan_one_exchange_window_group_limit(spark):
    rows = [(f"d{i}", i % 3, i + 1) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "g", "w"])
    plan = priority_sample(df, "k", "w", k=5, by=("g",))._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan
    assert "PythonUDF" not in plan and "MapInPandas" not in plan
