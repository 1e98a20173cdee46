"""Similarity search over the ``embeddings`` table (training-data extras).

- :func:`brute_force_topk` — exact cosine top-k: cross join bounded by
  broadcast of the (small) query side, `zip_with` dot products JVM-side,
  per-query `row_number` window. The baseline any ANN variant is measured
  against.
- :func:`quantized_dot_topk` — same shape but on integer-quantized vectors:
  bit-exact across engines (the DuckDB oracle replays it), deterministic
  tie-breaks.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH buckets
  (sign of dot with deterministic hash-derived hyperplanes) shrink the
  candidate set from |corpus| to a bucket; at 100 TB the bucket join
  replaces the cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query side is broadcast (small); the corpus side streams — no
    shuffle of the big table, one window per query partition.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cvec"),
    )
    qd = q.select(
        query_id_col,
        F.transform(F.col("_qvec"), lambda x: x.cast("double")).alias("_qvec"),
    )
    joined = c.crossJoin(F.broadcast(qd))
    cos = _dot(F.col("_cvec"), F.col("_qvec")) / (
        _norm(F.col("_cvec")) * _norm(F.col("_qvec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def quantize_expr(vec_col, scale: int = 1000):
    """array<float> → array<bigint> by round(x*scale): bit-exact in any
    engine, so similarity ranks become integer comparisons."""
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * scale, 0).cast("long")
    )


def quantized_dot_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1000,
) -> DataFrame:
    """Integer-exact top-k by quantized dot product (oracle-checkable)."""
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), quantize_expr(F.col(vec_col), scale).alias("_cq")
    )
    q = queries.select(
        F.col(query_id_col), quantize_expr(F.col(vec_col), scale).alias("_qq")
    )
    dot = F.aggregate(
        F.zip_with(F.col("_cq"), F.col("_qq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("dot", dot)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", F.col("rank").cast("int").alias("rank"), "dot")
    )


def hyperplane_expr(dim: int, plane_idx: int, scale: int = 1000):
    """Deterministic pseudo-random hyperplane: component j of plane i =
    (xxhash64(i, j) mod 2001) - 1000 — reproducible anywhere."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.lit(plane_idx), j), F.lit(2 * scale + 1)) - scale
        ).cast("double"),
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
) -> DataFrame:
    """ANN top-k: random-hyperplane signature buckets, join on bucket, rank
    within candidates. Recall < 1 by design; measured against
    :func:`brute_force_topk` in tests."""
    dim = len(embeddings.select(vec_col).first()[0])

    def signature(vec):
        sig = F.lit(0).cast("long")
        for i in range(n_planes):
            bit = F.when(_dot(vec, hyperplane_expr(dim, i)) >= 0, 1).otherwise(0)
            sig = sig * 2 + bit
        return sig

    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cvec"),
    ).withColumn("bucket", signature(F.col("_cvec")))
    q = queries.select(
        F.col(query_id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qvec"),
    ).withColumn("bucket", signature(F.col("_qvec")))
    joined = c.join(F.broadcast(q), "bucket")
    cos = _dot(F.col("_cvec"), F.col("_qvec")) / (
        _norm(F.col("_cvec")) * _norm(F.col("_qvec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
    )
