"""Differential tests for operators/quantiles.py against a pure-Python
sorted-selection oracle (the definition itself: value at rank ceil(q*n))."""

from __future__ import annotations

import math
import random

import pytest

from pyld_spark.operators.quantiles import exact_quantiles


def _oracle(values, qs):
    s = sorted(values)
    n = len(s)
    out = {}
    for q in qs:
        r = max(1, math.ceil(q * n))  # same float product both engines use
        out[q] = (r, s[r - 1])
    return out


def _run(spark, rows, qs, by=(), n_bins=16):
    cols = list(by) + ["v"]
    df = spark.createDataFrame(rows, cols)
    got = exact_quantiles(df, "v", qs=qs, by=tuple(by), n_bins=n_bins).collect()
    return got


def test_global_matches_oracle(spark):
    rng = random.Random(7)
    vals = [rng.randint(-500, 500) for _ in range(337)]
    qs = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    got = {r["q"]: (r["rank"], r["value"]) for r in _run(spark, [(v,) for v in vals], qs)}
    assert got == _oracle(vals, qs)


def test_grouped_with_ties_and_skew(spark):
    rng = random.Random(11)
    rows = []
    groups = {}
    for g in ("a", "b", "c"):
        # heavy ties: half the rows share one value (the hot-bin case)
        base = rng.randint(0, 50)
        vals = [base] * 40 + [rng.randint(0, 100) for _ in range(40)]
        groups[g] = vals
        rows += [(g, v) for v in vals]
    qs = (0.25, 0.5, 0.75)
    got = {}
    for r in _run(spark, rows, qs, by=("g",), n_bins=8):
        got.setdefault(r["g"], {})[r["q"]] = (r["rank"], r["value"])
    for g, vals in groups.items():
        assert got[g] == _oracle(vals, qs), g


def test_single_value_group_and_tiny_n(spark):
    rows = [("one", 42), ("flat", 7), ("flat", 7), ("flat", 7)]
    got = {}
    for r in _run(spark, rows, (0.5, 1.0), by=("g",)):
        got.setdefault(r["g"], {})[r["q"]] = r["value"]
    assert got == {"one": {0.5: 42, 1.0: 42}, "flat": {0.5: 7, 1.0: 7}}


def test_n_smaller_than_bins_and_negative_range(spark):
    vals = [-9, -3, -3, 0, 12]
    got = {r["q"]: r["value"] for r in _run(spark, [(v,) for v in vals], (0.2, 0.4, 0.6, 0.8, 1.0), n_bins=4096)}
    assert got == {0.2: -9, 0.4: -3, 0.6: -3, 0.8: 0, 1.0: 12}


def test_bin_width_invariance(spark):
    rng = random.Random(23)
    vals = [rng.randint(0, 10_000) for _ in range(500)]
    qs = (0.1, 0.5, 0.9)
    ref = None
    for n_bins in (2, 16, 1024):
        got = {r["q"]: (r["rank"], r["value"]) for r in _run(spark, [(v,) for v in vals], qs, n_bins=n_bins)}
        ref = ref or got
        assert got == ref, n_bins
    assert ref == _oracle(vals, qs)


def test_rejects_bad_args(spark):
    df = spark.createDataFrame([(1,)], ["v"])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", qs=())
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", qs=(0.0,))
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", qs=(1.5,))
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", n_bins=1)


def test_refine_pass_invariance(spark):
    rng = random.Random(31)
    vals = [rng.randint(-1000, 10_000) for _ in range(800)]
    qs = (0.05, 0.5, 0.95, 1.0)
    ref = None
    for passes in (0, 1, 2, 3):
        got = {
            r["q"]: (r["rank"], r["value"])
            for r in _run_passes(spark, [(v,) for v in vals], qs, passes)
        }
        ref = ref or got
        assert got == ref, passes
    assert ref == _oracle(vals, qs)


def test_refine_with_heavy_ties_and_groups(spark):
    # all-equal candidate bins exercise the _shi == _slo degenerate branch
    rows = [("a", 5)] * 50 + [("a", 9)] * 3 + [("b", -2), ("b", -2), ("b", 0)]
    got = {}
    for r in _run_passes(spark, rows, (0.5, 1.0), 2, by=("g",)):
        got.setdefault(r["g"], {})[r["q"]] = r["value"]
    assert got == {"a": {0.5: 5, 1.0: 9}, "b": {0.5: -2, 1.0: 0}}


def _run_passes(spark, rows, qs, passes, by=()):
    cols = list(by) + ["v"]
    df = spark.createDataFrame(rows, cols)
    return exact_quantiles(
        df, "v", qs=qs, by=tuple(by), n_bins=8, refine_passes=passes
    ).collect()
