"""Text analysis over ``documents`` (training-data extras): language ID,
quality scoring, token counting, fingerprinting. All pure column
expressions — no Python in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (deterministic, SQL-reproducible)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "from",
]


def tokens_expr(col_name: str):
    """Whitespace tokenization (lowercased), as a SQL expression string."""
    return F.expr(f"filter(split(lower({col_name}), '\\\\s+'), t -> t != '')")


def bpe_ish_token_count(col_name: str):
    """BPE-ish token estimate: letter runs + digit runs + individual
    punctuation marks (a deterministic subword-count proxy; RE2-compatible —
    no lookarounds — so the DuckDB oracle can replay it)."""
    return (
        F.size(F.expr(f"regexp_extract_all({col_name}, '[a-zA-Z]+', 0)"))
        + F.size(F.expr(f"regexp_extract_all({col_name}, '[0-9]+', 0)"))
        + F.size(F.expr(f"regexp_extract_all({col_name}, '[^a-zA-Z0-9\\\\s]', 0)"))
    )


def text_stats(documents: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: chars, whitespace tokens, BPE-ish tokens,
    punctuation ratio, stopword ratio, mean word length."""
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_wl = F.when(
        n_tokens > 0,
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / n_tokens.cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return documents.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        bpe_ish_token_count(text_col).cast("bigint").alias("n_bpe_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)).cast("double"), 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)).cast("double"), 4).alias("stopword_ratio"),
        mean_wl.alias("mean_word_len"),
    )


def quality_expr(text_col: str):
    """The quality score as ONE column expression over ``text_col`` —
    bit-identical to :func:`quality_score` (same sub-expressions, same
    rounding points). Exists so composed pipelines (curation ledger) can
    fold quality into an existing projection instead of paying a doc_id
    join exchange per stage."""
    toks = tokens_expr(text_col)
    n_tokens_raw = F.size(toks)
    n_tokens = n_tokens_raw.cast("bigint")
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    punct_ratio = F.round(
        n_punct / F.greatest(n_chars, F.lit(1)).cast("double"), 4
    )
    mean_wl = F.when(
        n_tokens_raw > 0,
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / n_tokens_raw.cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    length_score = F.least(n_tokens / F.lit(50.0), F.lit(1.0))
    word_len_score = F.when(
        (mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 4)
    return F.round(
        (length_score * 0.4 + word_len_score * 0.3 + punct_score * 0.3), 4
    )


def quality_score(documents: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality score in [0,1]: rewards reasonable length and
    word sizes, penalizes punctuation soup — the classic cheap pre-filter
    for training corpora."""
    return documents.select(id_col, quality_expr(text_col).alias("quality"))


def _lang_best_struct(text_col: str):
    """(hits, lang) struct of the argmax marker language for ``text_col``."""
    toks = tokens_expr(text_col)

    def _contains(markers):
        # closure factory: a default-arg lambda would change the lambda's
        # arity and make Spark pass (element, index)
        return lambda t: F.array_contains(markers, t)

    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, _contains(markers))).cast("bigint").alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct compares (hits, lang) lexicographically: max hits,
    # then lexicographically-last language — invert lang for alpha tie-break
    return F.array_max(F.array(*scores))


def pred_lang_expr(text_col: str):
    """The predicted-language column alone (expression-level twin of
    :func:`language_id`, for join-free composition)."""
    best = _lang_best_struct(text_col)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def language_id(documents: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language ID: score = number of marker-word hits per
    language; predicted = argmax (ties broken alphabetically), 'und' if no
    hits. Deterministic and SQL-reproducible."""
    best = _lang_best_struct(text_col)
    return documents.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].alias("marker_hits"),
    )


def doc_fingerprint(documents: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    k-shingles (rolling-window hash equivalent, engine-portable)."""
    from pyld_spark.operators.dedup import shingle_expr

    return documents.select(
        F.col(id_col),
        F.md5(F.concat_ws("\x00", F.array_sort(shingle_expr(text_col, k)))).alias(
            "fingerprint"
        ),
    )
