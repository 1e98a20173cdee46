"""IVF-flat ANN vs a pure-Python replay of the same index semantics."""

import random

from pyspark.sql import functions as F

from pyld_spark.operators.similarity import ivf_topk_quantized


def _quant(v, scale=1000):
    # mirror quantize_expr: round-half-up at .5 like Spark's ROUND
    out = []
    for x in v:
        s = x * scale
        r = int(s + 0.5) if s >= 0 else -int(-s + 0.5)
        out.append(r)
    return out


def _py_ivf(vecs, query_ids, k, nlist, nprobe, scale=1000):
    ids = sorted(vecs)
    cents = {cid: _quant(vecs[cid], scale) for cid in ids[:nlist]}
    qv = {i: _quant(v, scale) for i, v in vecs.items()}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    assign = {}
    for i, v in qv.items():
        best = max(cents, key=lambda c: (dot(v, cents[c]), -c))
        assign.setdefault(best, []).append(i)
    out = set()
    for q in query_ids:
        cells = sorted(cents, key=lambda c: (-dot(qv[q], cents[c]), c))[:nprobe]
        cand = [i for c in cells for i in assign.get(c, [])]
        ranked = sorted(cand, key=lambda i: (-dot(qv[q], qv[i]), i))[:k]
        for r, i in enumerate(ranked, 1):
            out.add((q, i, r, dot(qv[q], qv[i])))
    return out


def _run(spark, vecs, query_ids, k=5, nlist=4, nprobe=2):
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    q = df.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["dot"])
        for r in ivf_topk_quantized(df, q, k=k, nlist=nlist, nprobe=nprobe).collect()
    }
    want = _py_ivf(vecs, query_ids, k, nlist, nprobe)
    assert got == want, (sorted(got) [:8], sorted(want)[:8])


def test_small_exact(spark):
    vecs = {
        0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.0, 1.0], 3: [0.1, 0.9],
        4: [0.7, 0.7], 5: [-1.0, 0.0], 6: [0.95, 0.05], 7: [-0.1, 1.0],
    }
    _run(spark, vecs, [0, 2], k=3, nlist=4, nprobe=2)


def test_random_matches_python_replay(spark):
    rng = random.Random(7)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(60)
    }
    _run(spark, vecs, [0, 1, 2], k=10, nlist=8, nprobe=3)


def test_probe_all_cells_equals_brute_force(spark):
    # nprobe == nlist -> IVF degenerates to exact quantized top-k
    from pyld_spark.operators.similarity import quantized_dot_topk

    rng = random.Random(13)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    q = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk_quantized(df, q, k=5, nlist=6, nprobe=6).collect()
    }
    brute = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in quantized_dot_topk(df, q, k=5).collect()
    }
    assert ivf == brute


def _py_kmeans(vecs, nlist, iters, scale=1000):
    """Sequential-fold replay of kmeans_centroids (exact: all sums are
    integer-valued or single correctly-rounded double ops)."""
    ids = sorted(vecs)
    qv = {i: _quant(vecs[i], scale) for i in ids}
    cent = {cid: [float(x) for x in qv[cid]] for cid in ids[:nlist]}

    def sdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    for _ in range(iters):
        assign = {}
        for i in ids:
            v = qv[i]
            vd = [float(x) for x in v]
            best, bd = None, None
            for cid in sorted(cent):
                d2 = sdot(cent[cid], cent[cid]) - 2.0 * sdot(vd, cent[cid])
                if bd is None or d2 < bd or (d2 == bd and cid < best):
                    best, bd = cid, d2
            assign.setdefault(best, []).append(i)
        for cid in cent:
            mem = assign.get(cid)
            if mem:
                dim = len(qv[mem[0]])
                cent[cid] = [
                    sum(qv[i][j] for i in mem) / len(mem) for j in range(dim)
                ]

    def rnd(x):
        import math
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    return {cid: [rnd(x) for x in c] for cid, c in cent.items()}


def test_kmeans_matches_python_replay(spark):
    from pyld_spark.operators.similarity import kmeans_centroids

    rng = random.Random(3)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(50)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    got = {
        r["cell_id"]: list(r["_cent"])
        for r in kmeans_centroids(df, nlist=4, iters=3).collect()
    }
    assert got == _py_kmeans(vecs, nlist=4, iters=3)


def test_ivf_with_trained_centroids(spark):
    from pyld_spark.operators.similarity import (
        ivf_topk_quantized,
        kmeans_centroids,
    )

    rng = random.Random(21)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    q = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent_df = kmeans_centroids(df, nlist=4, iters=2)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["dot"])
        for r in ivf_topk_quantized(
            df, q, k=5, nprobe=2, centroids=cent_df
        ).collect()
    }

    # python replay with the SAME (verified-above) centroid table
    cents = {
        r["cell_id"]: list(r["_cent"]) for r in cent_df.collect()
    }
    qv = {i: _quant(v) for i, v in vecs.items()}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    assign = {}
    for i, v in qv.items():
        best = max(cents, key=lambda c: (dot(v, cents[c]), -c))
        assign.setdefault(best, []).append(i)
    want = set()
    for qid in (0, 1):
        cells = sorted(cents, key=lambda c: (-dot(qv[qid], cents[c]), c))[:2]
        cand = [i for c in cells for i in assign.get(c, [])]
        for r, i in enumerate(
            sorted(cand, key=lambda i: (-dot(qv[qid], qv[i]), i))[:5], 1
        ):
            want.add((qid, i, r, dot(qv[qid], qv[i])))
    assert got == want
