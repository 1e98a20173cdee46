"""Deduplication operators over the ``documents`` table — the training-data
pipeline half of the engine (no reference analogue; required extras).

All-relational designs (whole-stage codegen, no Python):

- :func:`exact_dedup` — md5 groupBy; survivor = min(doc_id).
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via inverted-index
  self-join (shuffle on shingle; skew-guarded by dropping ultra-common
  shingles, the classic stopword-shingle optimization).
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash+LSH:
  shingle → K permutation-hash minima (xxhash64 with per-permutation seed
  columns) → band buckets → candidate join. At 100 TB this is *the* scale
  path: cost is linear in corpus size + bucket collisions, never pairwise.
- :func:`simhash_signatures` — 64-bit SimHash from token hash sign-sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_expr(col_name: str, k: int = 5):
    """array_distinct of character k-shingles, as a SQL expression (usable
    verbatim in Spark SQL; DuckDB oracle mirrors it with list comprehension)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({col_name}) - {k - 1}, 1)),"
        f" i -> substring({col_name}, i, {k})))"
    )


def exact_dedup(documents: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, content_hash, survivor_id, is_duplicate) per document.

    One shuffle on the 32-hex-char hash; survivor = min(doc_id) per group.
    """
    h = documents.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    survivors = h.groupBy("content_hash").agg(F.min(id_col).alias("survivor_id"))
    return (
        h.join(survivors, "content_hash")
        .select(
            id_col, "content_hash", "survivor_id",
            (F.col(id_col) != F.col("survivor_id")).alias("is_duplicate"),
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via inverted index.

    plan: explode shingles → drop shingles appearing in > ``max_shingle_df``
    docs (skew guard: a stop-shingle would produce df² join rows) → self-join
    on shingle → count intersections → join sizes → filter by threshold.
    Returns (doc_a, doc_b, inter, size_a, size_b, jaccard) with doc_a < doc_b.
    """
    sh = documents.select(
        F.col(id_col).alias("doc"), F.explode(shingle_expr(text_col, k)).alias("sh")
    )
    sizes = sh.groupBy("doc").agg(F.count("*").cast("bigint").alias("size"))
    df_counts = sh.groupBy("sh").agg(F.count("*").alias("df"))
    sh_f = sh.join(df_counts.filter(F.col("df") <= max_shingle_df), "sh")
    # explicit conf-driven width on the probe side: the filtered posting
    # list is small, so AQE coalesces it to a couple of partitions — but the
    # self-join OUTPUT is sum(df^2) rows (285M at sf0.1), invisible to AQE,
    # and would grind through one or two tasks (guide §2.5). The partial
    # aggregation below still runs map-side, so the (doc_a, doc_b) shuffle
    # stays bounded by the candidate-pair count.
    n = int(documents.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = sh_f.select(F.col("doc").alias("doc_a"), "sh").repartition(n, "sh")
    b = sh_f.select(F.col("doc").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("size").alias("size_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("size").alias("size_b"))
    jac = F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
    )


def minhash_signatures(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 64,
) -> DataFrame:
    """(doc_id, sig array<long>): MinHash signature from k-shingles.

    Permutation i = xxhash64(shingle, seed_i); the signature entry is the
    minimum over shingles — all inside one JVM projection, no shuffle.
    """
    return _exploded_signatures(
        documents, text_col, id_col, k, num_hashes,
        lambda s, p: F.xxhash64(s, p),
    )


def _exploded_signatures(documents, text_col, id_col, k, num_hashes, perm_hash):
    """Shared signature dataflow: explode shingles × permutation ids, hash in
    a flat codegen projection, map-side-aggregate the per-(doc, perm) minima,
    and rebuild the perm-ordered array.

    Byte-identical to the old ``array(array_min(transform(shingles, h_i)))``
    projection (pinned by tests/test_r06_optimized_ops.py incl. null/empty/
    short-text docs) but ~20x faster: higher-order functions are interpreted
    expressions, and the nested form both re-built the shingle array once per
    permutation and evaluated every hash through the interpreter
    (optimization guide §4.1: built-ins/codegen over per-element interpreted
    work; §2.3: the (doc, perm, min) shuffle is tiny because partial
    aggregation runs map-side). Requires ``id_col`` to identify rows (the
    established contract of every dedup operator here): duplicate ids
    collapse to one signature row.
    """
    sh = documents.select(
        F.col(id_col), F.explode(shingle_expr(text_col, k)).alias("_s")
    )
    perms = sh.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("_p"),
        "_s",
    )
    mins = (
        perms.select(id_col, "_p", perm_hash(F.col("_s"), F.col("_p")).alias("_h"))
        .groupBy(id_col, "_p")
        .agg(F.min("_h").alias("_m"))
    )
    return mins.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_p"), F.col("_m")))),
            lambda s: s["_m"],
        ).alias("sig")
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket; docs sharing
    any (band, bucket) become candidate pairs.

    Shuffles once on (band, bucket); hot buckets are bounded because a bucket
    key includes the band hash of ``rows_per_band`` 64-bit minima.
    Returns distinct (doc_a, doc_b) candidates with doc_a < doc_b.
    """
    banded = signatures.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash pipeline: signatures → LSH candidates → verify candidates
    with estimated Jaccard (signature agreement)."""
    # one small row per doc; the lazy checkpoint makes the three consumers
    # (banding sides + both verification joins) read the computed signature
    # table instead of re-running the whole shingle+hash pipeline each —
    # the plan had FOUR full signature computations and zero exchange reuse
    sigs = minhash_signatures(documents, text_col, id_col, k, num_hashes)
    sigs = sigs.localCheckpoint(eager=False)
    cands = minhash_lsh_pairs(sigs, id_col, bands, num_hashes // bands)
    sa = sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(num_hashes)
    # signature join: the signatures side is |corpus|-sized, so it must NOT
    # be broadcast at scale — shuffle-join on doc id (AQE may still pick a
    # broadcast at small SF from its own size estimate, which is correct)
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def minhash_signatures_md5(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 32,
) -> DataFrame:
    """(doc_id, sig array<string>): portable MinHash basis.

    Permutation i = md5(i || ':' || shingle); the signature entry is the
    lexicographic minimum hex digest (the min of a uniform hash is a valid
    permutation minimum regardless of representation). This is the
    oracle-checkable variant — md5 exists in every engine; the xxhash64
    basis (:func:`minhash_signatures`) stays the production scale path
    (8-byte entries instead of 32-char strings).
    """
    return _exploded_signatures(
        documents, text_col, id_col, k, num_hashes,
        lambda s, p: F.md5(F.concat(p.cast("string"), F.lit(":"), s)),
    )


def minhash_dedup_pairs_md5(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Oracle-checkable MinHash pipeline: md5 signatures → md5-bucket LSH
    candidates → verify by signature agreement count.

    Same plan shape as :func:`minhash_dedup_pairs` (banded bucket join —
    linear in corpus size, never all-pairs) but every hash is replayable in
    ANSI-ish SQL. Emits integer ``n_agree`` (not a rounded ratio) so the
    comparison is bit-exact across engines.
    """
    rows_per_band = num_hashes // bands
    # lazy checkpoint: same 4x-recompute fix as minhash_dedup_pairs
    sigs = minhash_signatures_md5(documents, text_col, id_col, k, num_hashes)
    sigs = sigs.localCheckpoint(eager=False)
    banded = sigs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws(
                        "|",
                        *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)],
                    ))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc").alias("doc_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    n_agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ).cast("bigint")
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_agree", n_agree)
        .filter(F.col("n_agree") >= F.lit(threshold * num_hashes))
        .select("doc_a", "doc_b", "n_agree")
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold_q6: int = 990000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    scale: int = 1000,
) -> DataFrame:
    """Embedding-based near-duplicate pairs: (id_a < id_b, cos_q6) where the
    fixed-point cosine ≥ ``threshold_q6``/10⁶.

    Scale path: random-hyperplane LSH buckets over quantized vectors (exact
    integer sign decisions — engine-portable) shrink candidates from
    all-pairs to per-bucket joins; true near-duplicates (cosine → 1) land in
    the same bucket with probability (1 - θ/π)^planes, so recall stays high
    exactly where dedup needs it. Cost is Σ bucket² — ``n_planes`` must grow
    with corpus size (buckets = 2^planes) to keep buckets bounded; at 100 TB
    use 16-24 planes (65k-16M buckets), optionally multiple plane sets
    OR-combined for recall. Never |corpus|².
    """
    from pyld_spark.operators.similarity import hyperplane_expr_md5, quantize_expr

    def signature(qvec):
        # dim is a parameter (like lsh_bucketed_topk) — reading it from the
        # data would fire a driver-side job during plan construction
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(qvec, hyperplane_expr_md5(dim, i, scale),
                               lambda x, h: x * h),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ) >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for i in range(n_planes)
        ]
        return F.concat(*bits)

    lsum = lambda arr: F.aggregate(arr, F.lit(0).cast("long"), lambda x, v: x + v)  # noqa: E731
    # per-VECTOR work (squared norm) computed once per row before the join —
    # the old shape re-evaluated both interpreted norm aggregates per
    # candidate PAIR inside the join (guide §1.2: per-task work; the norms
    # are exact integers, so the cosine bits are unchanged)
    q = (
        embeddings.select(
            F.col(id_col).alias("vid"), quantize_expr(F.col(vec_col), scale).alias("vq")
        )
        .withColumn("bucket", signature(F.col("vq")))
        .withColumn("_nrm", lsum(F.transform(F.col("vq"), lambda x: x * x)))
    )
    n = int(embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # explicit width: the bucketed table is small, so AQE would run the whole
    # quadratic per-bucket join output in one task (the candidate volume is
    # in the join OUTPUT, invisible to AQE)
    # co-partitioned on the bucket key (no forced-broadcast hint: the
    # bucketed table is corpus-sized; the optimizer may still auto-broadcast
    # one side when it genuinely fits)
    a = q.select(
        F.col("vid").alias("id_a"), F.col("vq").alias("vq_a"),
        F.col("_nrm").alias("_na"), "bucket",
    ).repartition(n, "bucket")
    b = q.select(
        F.col("vid").alias("id_b"), F.col("vq").alias("vq_b"),
        F.col("_nrm").alias("_nb"), "bucket",
    ).repartition(n, "bucket")
    dot = lsum(F.zip_with(F.col("vq_a"), F.col("vq_b"), lambda x, y: x * y))
    cos = dot.cast("double") / F.sqrt(F.col("_na").cast("double") * F.col("_nb").cast("double"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_q6", F.floor(cos * 1000000).cast("bigint"))
        .filter(F.col("cos_q6") >= threshold_q6)
        .select("id_a", "id_b", "cos_q6")
        .distinct()
    )


def simhash_signatures(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, simhash long): 64-bit SimHash over whitespace tokens.

    For each bit position: sum over tokens of (+1 if xxhash64(token) has the
    bit set else -1); the signature bit is the sign. Pure JVM expressions.
    """
    tokens = F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')")
    hashed = F.transform(tokens, lambda t: F.xxhash64(t))

    def _bit_sum(i):
        # closure factory (a default-arg lambda would change the arity
        # Spark uses to decide the lambda signature)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = [
        F.when(
            F.aggregate(hashed, F.lit(0).cast("long"), _bit_sum(i)) > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    sim = bits[0]
    for i in range(1, 64):
        sim = sim + F.shiftleft(bits[i], i)
    return documents.select(F.col(id_col), sim.alias("simhash"))


def _hamming_block_offsets(n_bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """(offset, length) per pigeonhole block — shared by the long and the
    bit-string signature variants so both block identically."""
    base, extra = divmod(n_bits, n_blocks)
    offsets, off = [], 0
    for i in range(n_blocks):
        ln = base + (1 if i < extra else 0)
        offsets.append((off, ln))
        off += ln
    return offsets


def simhash_signatures_md5(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, simbits string): portable 64-bit SimHash as a '0'/'1' string.

    Token hash bits come from the md5 hex digest (bit j = bit j%4 of hex
    digit j//4), so any engine with md5 can replay the signature exactly.
    The xxhash64-long basis (:func:`simhash_signatures`) remains the scale
    path; this variant exists for the DuckDB-certified gate query.
    """
    # Explode tokens and aggregate the 64 ±1 bit sums as flat codegen
    # conditional sums instead of an interpreted aggregate-of-zip_with over a
    # 64-wide array per token (guide §4.1: HOFs are interpreted expressions).
    # explode_outer keeps token-less docs (null/empty/whitespace text): their
    # single null-hash row contributes 0 to every sum, so they still emit the
    # all-zeros signature the old projection produced. Byte-identical output
    # pinned by tests/test_r06_optimized_ops.py. Duplicate ids collapse to
    # one row (the id contract shared by every dedup operator here).
    tokens = F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')")
    tok = documents.select(
        F.col(id_col), F.explode_outer(tokens).alias("_t")
    ).select(F.col(id_col), F.md5(F.col("_t")).alias("_h"))

    def pm1(j):
        digit = F.conv(F.substring(F.col("_h"), j // 4 + 1, 1), 16, 10).cast("int")
        bit = F.shiftright(digit, j % 4).bitwiseAND(F.lit(1))
        return F.when(F.col("_h").isNull(), F.lit(0)).otherwise(
            F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))
        )

    sums = tok.groupBy(id_col).agg(
        *[F.sum(pm1(j)).alias(f"_s{j}") for j in range(64)]
    )
    bits = F.concat(
        *[
            F.when(F.col(f"_s{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(64)
        ]
    )
    return sums.select(F.col(id_col), bits.alias("simbits"))


def simhash_near_pairs_md5(
    signatures: DataFrame, id_col: str = "doc_id", max_hamming: int = 16,
) -> DataFrame:
    """Near-duplicate pairs over bit-string SimHash signatures (same
    pigeonhole block join as :func:`simhash_near_pairs`; hamming distance =
    count of differing positions, an integer — bit-exact across engines)."""
    offsets = _hamming_block_offsets(64, max_hamming + 1)
    blocks = F.array(
        *[F.substring(F.col("simbits"), o + 1, ln) for o, ln in offsets]
    )
    # Pack the bit-string ONCE per row into two 32-bit halves: the pair
    # Hamming distance is then xor+bit_count (whole-stage codegen) instead of
    # an interpreted 64-step aggregate over substrings evaluated per
    # CANDIDATE pair in the join filter. At max_hamming=16 the pigeonhole
    # blocks are 4 bits wide (17x16 = 272 join keys), so candidate pairs are
    # ~N^2/16 per block index — at 5k docs the old expression evaluated ~10^9
    # interpreted ops in ONE task (25+ min); this shape runs in seconds.
    # Exactly the same distance: count of differing '0'/'1' chars ==
    # bit_count of the xor of the parsed halves.
    hi = F.conv(F.substring("simbits", 1, 32), 2, 10).cast("long")
    lo = F.conv(F.substring("simbits", 33, 32), 2, 10).cast("long")
    n = int(signatures.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # both join sides derive from the signature table — checkpoint it lazily
    # so the (groupBy-heavy) signature computation runs once, not per side
    signatures = signatures.localCheckpoint(eager=False)
    blocked = signatures.select(
        F.col(id_col).alias("doc"), hi.alias("_hi"), lo.alias("_lo"),
        F.posexplode(blocks).alias("block_idx", "block_val"),
    )
    # explicit width on the probe side: the blocked table is tiny (17 rows
    # per doc) so AQE would coalesce it to one partition and run the whole
    # quadratic join output in a single task; the candidate volume lives in
    # the join OUTPUT, which AQE cannot see (guide §2.5)
    # co-partition BOTH sides with an explicit count (REPARTITION_BY_NUM is
    # exempt from AQE coalescing): the join runs wide at any scale, and the
    # optimizer remains free to auto-broadcast one side when it actually
    # fits — no forced-broadcast hint, because the blocked table is
    # 17 rows/doc and grows with the corpus
    a = blocked.select(
        F.col("doc").alias("doc_a"), F.col("_hi").alias("_hi_a"),
        F.col("_lo").alias("_lo_a"), "block_idx", "block_val",
    ).repartition(n, "block_idx", "block_val")
    b = blocked.select(
        F.col("doc").alias("doc_b"), F.col("_hi").alias("_hi_b"),
        F.col("_lo").alias("_lo_b"), "block_idx", "block_val",
    ).repartition(n, "block_idx", "block_val")
    hamming = (
        F.bit_count(F.col("_hi_a").bitwiseXOR(F.col("_hi_b")))
        + F.bit_count(F.col("_lo_a").bitwiseXOR(F.col("_lo_b")))
    ).cast("bigint")
    return (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        # filter BEFORE the distinct: the xor+bit_count distance is codegen-
        # cheap per generated pair, and at max_hamming=16 it drops the vast
        # majority of the ~sum(block_df^2) candidates, so the distinct
        # aggregates a small survivor set instead of every generated pair.
        # distinct-then-filter == filter-then-distinct on a derived column,
        # so the output is unchanged for every input.
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs(
    signatures: DataFrame, id_col: str = "doc_id", max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance.

    Blocking: the 64-bit signature is split into ``max_hamming + 1`` blocks —
    by pigeonhole, any pair within the distance budget shares at least one
    exact block, so the join is on (block_idx, block_value), never all-pairs.
    """
    offsets = _hamming_block_offsets(64, max_hamming + 1)
    blocks = F.array(
        *[
            F.shiftright(F.col("simhash"), o).bitwiseAND(F.lit((1 << ln) - 1))
            for o, ln in offsets
        ]
    )
    blocked = signatures.select(
        F.col(id_col).alias("doc"), F.col("simhash"),
        F.posexplode(blocks).alias("block_idx", "block_val"),
    )
    a = blocked.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "block_idx", "block_val",
    )
    b = blocked.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "block_idx", "block_val",
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        # filter before distinct (same output — see the md5 variant): the
        # distance is one xor+bit_count, the distinct is the expensive part
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def duplicate_spans(
    documents: DataFrame,
    k: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicate-substring spans, per Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (arXiv:2107.06499): every
    maximal word range covered by k-word shingles that occur >= min_count
    times ANYWHERE in the corpus (cross- or within-document). Output one
    row per merged span: (doc_id, start_word, end_word, n_words, n_grams)
    with 1-based inclusive word positions.

    The paper builds a corpus suffix array - inherently sequential and
    RAM-bound. At 10^12-turn scale the same signal decomposes into plain
    dataflow: (1) explode k-shingles with their start position (narrow);
    (2) ONE count aggregation keyed on the md5 of the shingle (fixed-width
    key regardless of k; map-side combine absorbs within-partition repeats
    of viral shingles); (3) a semi join routes only duplicated shingles
    back to their positions; (4) per-doc gaps-and-islands interval merge -
    a window over (doc_id, pos), bounded by the doc's own hit count. Every
    stage is linear in corpus size and every key is either the shingle
    hash (high cardinality) or doc_id (high cardinality); nothing is
    all-pairs. False-positive risk is the md5 collision rate (~2^-64 per
    pair at petabyte shingle counts) - acceptable for span REMOVAL, noted
    per the paper's own hash-based approximations.
    """
    w = F.expr(
        rf"filter(split(lower({text_col}), '\\s+'), x -> x <> '')"
    )
    base = documents.select(F.col(id_col).alias("doc_id"), w.alias("words"))
    shingles = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(words) >= {k} THEN "
                f"transform(sequence(1, size(words) - {k} + 1), "
                f"i -> named_struct('pos', i, "
                f"'h', md5(array_join(slice(words, i, {k}), ' ')))) "
                f"ELSE array() END"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    dup = (
        shingles.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("h")
    )
    hits = shingles.join(dup, "h", "left_semi").select("doc_id", "pos")

    from pyspark.sql import Window

    order = Window.partitionBy("doc_id").orderBy("pos")
    prev_max = F.max("pos").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    # all intervals are length k, so "overlaps or touches the running
    # span" is pos <= prev_max_pos + k
    islanded = hits.withColumn(
        "new_span",
        F.when(prev_max.isNull() | (F.col("pos") > prev_max + k), 1).otherwise(0),
    ).withColumn(
        "span_no",
        F.sum("new_span").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return islanded.groupBy("doc_id", "span_no").agg(
        F.min("pos").alias("start_word"),
        (F.max("pos") + F.lit(k - 1)).alias("end_word"),
        (F.max("pos") - F.min("pos") + F.lit(k)).alias("n_words"),
        F.count("*").alias("n_grams"),
    ).drop("span_no")


def semantic_dedup(
    embeddings: DataFrame,
    nlist: int = 16,
    threshold_q6: int = 990000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) as dataflow: cluster
    the corpus embeddings into ``nlist`` cells, then within each cell drop
    every vector whose fixed-point cosine to ANY earlier-ranked cell member
    is ≥ ``threshold_q6``/10⁶ — the paper's upper-triangular-max rule, with
    rank = (centroid-similarity ASC, id ASC) so the kept representative of
    each duplicate neighborhood is the one FURTHEST from its centroid
    (the paper's "keep low centroid-similarity examples" choice).

    Returns one row per input vector: (id, cell_id, centroid_rank, kept).

    Scale shape: ONE broadcast-centroid argmax pass assigns cells (narrow —
    same plan as :func:`~pyld_spark.operators.similarity.ivf_topk_quantized`);
    one shuffle on ``cell_id`` serves both the rank window and the pairwise
    self-join; the pairwise stage is Σ cell² — the paper's own cost model —
    so ``nlist`` must grow with the corpus to hold cells at ~10⁴ vectors
    (100k cells at 10⁹ docs). All similarity math is integer-quantized, so
    the DuckDB oracle replays every decision bit-exactly. Pass
    ``centroids=kmeans_centroids(...)`` for trained cells; the default
    deterministic quantizer keeps the whole operator oracle-replayable.
    """
    from pyspark.sql import Window

    from pyld_spark.operators.similarity import ivf_centroids, quantize_expr

    cent = (
        centroids
        if centroids is not None
        else ivf_centroids(embeddings, nlist, id_col, vec_col, scale)
    )
    idot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qv = embeddings.select(
        F.col(id_col).alias("_vid"),
        quantize_expr(F.col(vec_col), scale).alias("_vq"),
    )
    # winner-take-all cell assignment; the winning dot IS max(_cdot)
    # (ties broken toward the smaller cell_id, which shares that max)
    assign = (
        qv.crossJoin(F.broadcast(cent))
        .select(
            "_vid",
            "_vq",
            "cell_id",
            idot(F.col("_vq"), F.col("_cent")).alias("_cdot"),
        )
        .groupBy("_vid")
        .agg(
            F.max_by(
                "cell_id", F.struct(F.col("_cdot"), -F.col("cell_id"))
            ).alias("cell_id"),
            F.max("_cdot").alias("_cdot"),
            F.first("_vq").alias("_vq"),
        )
    )
    # one explicit partitioning on cell_id serves the window AND both sides
    # of the pairwise join below; the lazy checkpoint truncates lineage so
    # the three consumers (output rows + both join sides) read the ranked
    # table instead of re-running the broadcast argmax pass each
    lsum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda x, v: x + v
    )
    n = int(embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranked = (
        # explicit partition count: with the column-only form AQE coalesces
        # the small ranked table to one partition and the quadratic pairwise
        # join below runs in a single task (its output volume is invisible
        # to AQE); the count is conf-driven, not a local constant
        assign.repartition(n, "cell_id")
        .withColumn(
            "centroid_rank",
            F.row_number()
            .over(
                Window.partitionBy("cell_id").orderBy(
                    F.col("_cdot").asc(), F.col("_vid").asc()
                )
            )
            .cast("int"),
        )
        # per-vector squared norm once per row, NOT per candidate pair in
        # the join below (exact integer — cosine bits unchanged)
        .withColumn("_nrm", lsum(F.transform(F.col("_vq"), lambda x: x * x)))
        .localCheckpoint(eager=False)
    )
    a = ranked.select(
        "cell_id",
        F.col("centroid_rank").alias("_rank_a"),
        F.col("_vq").alias("_vq_a"),
        F.col("_nrm").alias("_na"),
    )
    b = ranked.select(
        "cell_id",
        F.col("centroid_rank").alias("_rank_b"),
        F.col("_vid").alias("_vid_b"),
        F.col("_vq").alias("_vq_b"),
        F.col("_nrm").alias("_nb"),
    )
    dot = lsum(F.zip_with(F.col("_vq_a"), F.col("_vq_b"), lambda x, y: x * y))
    cos_q6 = F.floor(
        dot.cast("double")
        / F.sqrt(F.col("_na").cast("double") * F.col("_nb").cast("double"))
        * 1000000
    ).cast("bigint")
    dropped = (
        a.join(b, "cell_id")
        .filter(F.col("_rank_a") < F.col("_rank_b"))
        .withColumn("_cos_q6", cos_q6)
        .filter(F.col("_cos_q6") >= threshold_q6)
        .select(F.col("_vid_b").alias("_vid"))
        .distinct()
    )
    return (
        ranked.join(
            dropped.withColumn("_hit", F.lit(True)), "_vid", "left"
        )
        .select(
            F.col("_vid").alias(id_col),
            "cell_id",
            "centroid_rank",
            F.col("_hit").isNull().alias("kept"),
        )
    )
