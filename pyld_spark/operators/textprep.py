"""Training-data text preparation over ``documents``: PII scrubbing and
sliding-window chunking. Both are pure column expressions — narrow
transformations with zero shuffles, so they scale linearly with input
splits (filter/column pruning pushes down to the parquet scan untouched).

No reference analogue (digitalbazaar/pyld has no corpus-prep surface);
these are the builder's-brief training-pipeline extras, designed like
textstats.py: every regex is RE2-compatible (no lookarounds, no
backrefs) so the DuckDB gate oracle replays the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) applied IN ORDER, each on the output of the
#: previous scrub — counts are per-step, so an SSN consumed by the card
#: pass is never double-counted. Patterns use only syntax shared by Java
#: regex (Spark) and RE2 (DuckDB): \b, \d, char classes, bounded repeats.
PII_PATTERNS = [
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
]


def pii_scrub(documents: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Replace PII-shaped spans (credit-card / SSN / phone / IPv4 / email)
    with typed placeholders; emit per-type match counts and the scrubbed
    text. Sequential scrub order is part of the contract (see
    PII_PATTERNS): each count is measured on the text as already scrubbed
    by the earlier, more specific patterns.
    """
    df = documents.select(F.col(id_col), F.col(text_col).alias("_t"))
    count_cols = []
    for name, pat, repl in PII_PATTERNS:
        cnt = f"n_{name}"
        df = df.withColumn(
            cnt,
            F.size(F.regexp_extract_all(F.col("_t"), F.lit(pat), F.lit(0)))
            .cast("bigint"),
        ).withColumn("_t", F.regexp_replace(F.col("_t"), pat, repl))
        count_cols.append(cnt)
    total = None
    for cnt in count_cols:
        total = F.col(cnt) if total is None else total + F.col(cnt)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in count_cols],
        total.cast("bigint").alias("n_pii"),
        F.col("_t").alias("scrubbed_text"),
    )


def chunk_documents(documents: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_size: int = 64,
                    stride: int = 48) -> DataFrame:
    """Fan each document out into sliding token windows of ``chunk_size``
    whitespace tokens advancing by ``stride`` (overlap = chunk_size -
    stride). Every token is covered; the final window may be short. Empty
    documents produce no chunks.

    Scale design: tokenize → per-row window-start array → posexplode —
    a pure narrow fan-out (no shuffle, no Python), so a 100 TB corpus
    chunks at scan speed and the output stays co-partitioned with its
    input split for any downstream per-doc work.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.expr(
        f"filter(split({text_col}, '\\\\s+'), t -> t != '')"
    )
    base = documents.select(F.col(id_col), toks.alias("_toks"))
    base = base.filter(F.size("_toks") > 0)
    n_windows = (
        F.greatest(
            F.ceil((F.size("_toks") - F.lit(chunk_size)) / F.lit(float(stride))),
            F.lit(0),
        )
        + 1
    ).cast("int")
    base = base.withColumn(
        "_starts",
        F.transform(F.sequence(F.lit(0), n_windows - 1), lambda i: i * stride),
    )
    exploded = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode("_starts").alias("chunk_idx", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def word_ngrams_expr(col_name: str, n: int):
    """array_distinct of lowercase word n-grams (whitespace tokenization),
    as a pure SQL expression (DuckDB oracle mirrors it with list ops)."""
    toks = f"filter(split(lower({col_name}), '\\\\s+'), t -> t <> '')"
    return F.expr(
        f"array_distinct(CASE WHEN size({toks}) < {n} "
        f"THEN CAST(array() AS array<string>) "
        f"ELSE transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) END)"
    )


def ngram_decontaminate(
    train: DataFrame,
    test: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hits_only: bool = False,
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with the
    evaluation set (the GPT-3/Gopher-style decontamination check).

    ``hits_only=True`` returns just ``(doc_id, n_hits)`` for documents with
    ≥1 eval-gram hit — skipping the full-train ``sizes`` join, so the
    result is contamination-sized (tiny) and downstream joins against the
    corpus broadcast instead of exchanging it (curation-ledger path).

    Returns one row per TRAIN document: (doc_id, n_grams, n_hits,
    contaminated). ``n_grams`` counts the doc's distinct n-grams,
    ``n_hits`` how many of them occur anywhere in ``test``.

    Scale shape: the test-set gram table is distinct-ed first — eval sets
    are orders of magnitude smaller than the corpus, so Catalyst/AQE
    broadcasts it and the train side stays a narrow scan → explode →
    broadcast-join → per-doc count with map-side combine. No train×train
    work, nothing quadratic; a hot gram ("the of and ...") costs rows
    only on the train side, bounded by its own document frequency.
    """
    test_grams = (
        test.select(F.explode(word_ngrams_expr(text_col, n)).alias("gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col),
        F.explode_outer(word_ngrams_expr(text_col, n)).alias("gram"),
    )
    hits = (
        train_grams.join(test_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    if hits_only:
        return hits
    sizes = train.select(
        F.col(id_col),
        F.size(word_ngrams_expr(text_col, n)).cast("bigint").alias("n_grams"),
    )
    return (
        sizes.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def pack_sequences(
    documents: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: tuple[str, ...] = (),
    shards: int = 16,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences ("packs").

    Within each (``by``..., shard) group, documents are laid end-to-end in
    deterministic ``id_col`` order over a token stream cut every ``seq_len``
    tokens; a document belongs to the pack where it STARTS (a straddling doc
    spills into the next window — the packer that actually splits text does
    so downstream with ``chunk_documents``). Output per document:
    (``by``..., shard, doc_id, n_tokens, pack_id, pack_offset), where
    pack_id is the window index within the group and pack_offset the
    document's token offset inside its window.

    Scale shape: ONE window aggregation partitioned by (by..., shard) —
    ``shards`` (first hex char of md5, portable to the SQL oracle) bounds
    every window partition to ~1/16 of a stratum regardless of corpus
    size, so no single-reducer global ordering exists anywhere. Assignment
    is deterministic: independent of input partitioning, stable under
    re-runs; appending documents with HIGHER ids never re-packs earlier
    ones within a shard.
    """
    from pyspark.sql import Window

    from pyld_spark.operators.textstats import bpe_ish_token_count

    if seq_len <= 0:
        raise ValueError("seq_len must be > 0")
    shard = F.substring(
        F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))), 1, 1
    )
    if shards == 1:
        shard = F.lit("0")
    elif shards != 16:
        raise ValueError("shards must be 1 or 16 (one hex char)")
    toks = bpe_ish_token_count(text_col).cast("bigint")
    w = (
        Window.partitionBy(*(list(by) + ["shard"]))
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = documents.select(
        *by, F.col(id_col), shard.alias("shard"), toks.alias("n_tokens")
    )
    prev = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return staged.select(
        *by,
        "shard",
        id_col,
        "n_tokens",
        F.floor(prev / seq_len).cast("bigint").alias("pack_id"),
        (prev % seq_len).cast("bigint").alias("pack_offset"),
    )
