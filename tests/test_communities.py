"""Label-propagation communities and deterministic random walks vs exact
pure-Python replays of the same recurrences."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pyld_spark.operators.communities import community_sizes, label_propagation
from pyld_spark.operators.walks import random_walks

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2**31
_SEED_W = 2654435761


def _sym(edges):
    s = set()
    for a, b in edges:
        if a != b:
            s.add((a, b))
            s.add((b, a))
    return s


def _lpa_replay(edges, iters):
    """Exact Python replay: synchronous, neighbor votes, (max cnt, min label)."""
    sym = _sym(edges)
    nbrs = {}
    for a, b in sym:
        nbrs.setdefault(a, []).append(b)
    labels = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n, ns in nbrs.items():
            cnt = {}
            for m in ns:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            new[n] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    return labels


def _mix(n):
    return (
        ord(n[0]) * 8191
        + ord(n[-1]) * 127
        + ord(n[max(len(n) - 2, 0)]) * 31
        + len(n) * 131
    )


def _walk_replay(edges, length, walks_per_node):
    sym = _sym(edges)
    nbrs = {}
    for a, b in sorted(sym):
        nbrs.setdefault(a, []).append(b)
    rows = []
    for n in nbrs:
        for w in range(walks_per_node):
            seed = (w * _SEED_W + _mix(n)) % _LCG_M
            cur = n
            wid = f"{n}#{w}"
            rows.append((wid, 0, cur))
            for t in range(1, length):
                seed = (seed * _LCG_A + _LCG_C + _mix(cur)) % _LCG_M
                cur = nbrs[cur][seed % len(nbrs[cur])]
                rows.append((wid, t, cur))
    return sorted(rows)


def _rand_edges(rng, trial):
    n = rng.randint(4, 40)
    nodes = [f"t{trial:02d}n{i:03d}" for i in range(n)]
    m = rng.randint(1, 3 * n)
    return [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(m)
    ]


def test_lpa_two_triangles_bridge(spark):
    # two triangles joined by one bridge edge: after a few synchronous
    # rounds each triangle agrees on its least member's label.
    edges = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
             ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
             ("a3", "b1")]
    out = label_propagation(spark.createDataFrame(edges, ["src", "dst"]), iters=4)
    got = {r["node"]: r["community"] for r in out.collect()}
    assert got == _lpa_replay(edges, 4)
    sizes = {
        r["community"]: r["n_members"]
        for r in community_sizes(
            label_propagation(spark.createDataFrame(edges, ["src", "dst"]), iters=4)
        ).collect()
    }
    assert sum(sizes.values()) == 6


def test_lpa_random_graphs_match_replay(spark):
    # trials fused into one run via node-id prefixes (same pattern as the
    # connected-components suite) — communities cannot cross trials.
    rng = random.Random(1411)
    all_edges, iters = [], 3
    for trial in range(10):
        all_edges.extend(_rand_edges(rng, trial))
    all_edges = [(a, b) for a, b in all_edges if a != b]
    if not all_edges:
        all_edges = [("t00n000", "t00n001")]
    df = spark.createDataFrame(all_edges, ["src", "dst"]).repartition(7)
    got = {r["node"]: r["community"]
           for r in label_propagation(df, iters=iters).collect()}
    assert got == _lpa_replay(all_edges, iters)


def test_lpa_partitioning_invariance(spark):
    rng = random.Random(77)
    edges = [(a, b) for a, b in _rand_edges(rng, 0) if a != b] or [("x", "y")]
    df1 = spark.createDataFrame(edges, ["src", "dst"]).coalesce(1)
    df2 = spark.createDataFrame(edges, ["src", "dst"]).repartition(13)
    r1 = sorted(map(tuple, label_propagation(df1, iters=5).collect()))
    r2 = sorted(map(tuple, label_propagation(df2, iters=5).collect()))
    assert r1 == r2


def test_walks_match_replay_and_edges(spark):
    rng = random.Random(90210)
    edges = []
    for trial in range(6):
        edges.extend(_rand_edges(rng, trial))
    edges = [(a, b) for a, b in edges if a != b] or [("x", "y")]
    df = spark.createDataFrame(edges, ["src", "dst"]).repartition(5)
    got = sorted(map(tuple, random_walks(df, length=5, walks_per_node=2).collect()))
    assert got == _walk_replay(edges, 5, 2)
    # every consecutive pair in every walk is a real (symmetric) edge
    sym = _sym(edges)
    by_walk = {}
    for wid, step, node in got:
        by_walk.setdefault(wid, {})[step] = node
    for wid, steps in by_walk.items():
        assert sorted(steps) == list(range(5))
        for t in range(1, 5):
            assert (steps[t - 1], steps[t]) in sym


def test_walks_row_count_is_linear(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    out = random_walks(
        spark.createDataFrame(edges, ["src", "dst"]), length=3, walks_per_node=3
    )
    # 4 nodes x 3 walks x 3 steps, regardless of degrees
    assert out.count() == 4 * 3 * 3
