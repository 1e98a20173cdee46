"""semantic_dedup (SemDeDup) vs a pure-Python replay of the same greedy
upper-triangular rule, on random vectors across threshold regimes."""

import math
import random

from pyld_spark.operators.dedup import semantic_dedup
from pyld_spark.operators.similarity import kmeans_centroids


def _quant(v, scale=1000):
    out = []
    for x in v:
        s = x * scale
        r = int(s + 0.5) if s >= 0 else -int(-s + 0.5)
        out.append(r)
    return out


def _py_semantic_dedup(vecs, nlist, threshold_q6, scale=1000):
    ids = sorted(vecs)
    qv = {i: _quant(v, scale) for i, v in vecs.items()}
    cents = {cid: qv[cid] for cid in ids[:nlist]}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cos_q6(a, b):
        return math.floor(
            dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)) * 1000000
        )

    assign = {}
    cdot = {}
    for i, v in qv.items():
        best = max(cents, key=lambda c: (dot(v, cents[c]), -c))
        assign.setdefault(best, []).append(i)
        cdot[i] = dot(v, cents[best])
    out = set()
    for cell, members in assign.items():
        order = sorted(members, key=lambda i: (cdot[i], i))
        for rank, i in enumerate(order, 1):
            hit = any(
                cos_q6(qv[j], qv[i]) >= threshold_q6 for j in order[: rank - 1]
            )
            out.add((i, cell, rank, not hit))
    return out


def _run(spark, vecs, nlist, threshold_q6, centroids=None):
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    cent = None
    if centroids is not None:
        cent = kmeans_centroids(df, nlist=nlist, iters=centroids)
    rows = semantic_dedup(
        df, nlist=nlist, threshold_q6=threshold_q6, centroids=cent
    ).collect()
    assert len(rows) == len(vecs)
    return {
        (r["vec_id"], r["cell_id"], r["centroid_rank"], r["kept"]) for r in rows
    }


def _random_vecs(rng, n, dim, n_dups):
    vecs = {}
    for i in range(n):
        vecs[i] = [rng.uniform(-1, 1) for _ in range(dim)]
    # plant near-duplicates: tiny perturbations of existing vectors
    for d in range(n_dups):
        src = rng.randrange(n)
        vecs[n + d] = [x + rng.uniform(-1e-3, 1e-3) for x in vecs[src]]
    return vecs


def test_semantic_dedup_matches_python_replay(spark):
    rng = random.Random(4242)
    vecs = _random_vecs(rng, n=80, dim=8, n_dups=20)
    for thr in (990000, 900000, 500000):
        got = _run(spark, vecs, nlist=6, threshold_q6=thr)
        want = _py_semantic_dedup(vecs, nlist=6, threshold_q6=thr)
        assert got == want, f"threshold {thr}"
        # the planted near-duplicates must actually drop someone
        assert any(not k for (_, _, _, k) in got)


def test_semantic_dedup_loose_threshold_and_single_cell(spark):
    rng = random.Random(7)
    vecs = _random_vecs(rng, n=40, dim=6, n_dups=5)
    # nlist=1: everything lands in one cell — pure pairwise semantics
    got = _run(spark, vecs, nlist=1, threshold_q6=700000)
    want = _py_semantic_dedup(vecs, nlist=1, threshold_q6=700000)
    assert got == want


def test_semantic_dedup_threshold_monotonicity(spark):
    rng = random.Random(99)
    vecs = _random_vecs(rng, n=60, dim=8, n_dups=10)
    kept_strict = {
        i for (i, _, _, k) in _run(spark, vecs, nlist=4, threshold_q6=999000) if k
    }
    kept_loose = {
        i for (i, _, _, k) in _run(spark, vecs, nlist=4, threshold_q6=400000) if k
    }
    # lowering the threshold can only drop MORE vectors
    assert kept_loose <= kept_strict


def test_semantic_dedup_with_trained_centroids(spark):
    """kmeans_centroids plugs in as the cell table; the greedy rule itself
    is assignment-agnostic, so just assert shape + plant-dup behavior."""
    rng = random.Random(31337)
    vecs = _random_vecs(rng, n=50, dim=8, n_dups=10)
    got = _run(spark, vecs, nlist=4, threshold_q6=990000, centroids=2)
    assert len(got) == 60
    dropped = [i for (i, _, _, k) in got if not k]
    assert dropped  # the planted dups collapse regardless of cell shape
