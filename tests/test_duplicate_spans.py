"""duplicate_spans vs a pure-Python suffix-scan oracle."""

import random
import re

from pyld_spark.operators.dedup import duplicate_spans


def _py_spans(texts, k, min_count=2):
    docs = {
        f"d{i}": [w for w in re.split(r"\s+", t.lower()) if w]
        for i, t in enumerate(texts)
    }
    counts = {}
    for words in docs.values():
        for i in range(len(words) - k + 1):
            g = " ".join(words[i : i + k])
            counts[g] = counts.get(g, 0) + 1
    out = set()
    for doc_id, words in docs.items():
        hits = sorted(
            i + 1  # 1-based
            for i in range(len(words) - k + 1)
            if counts[" ".join(words[i : i + k])] >= min_count
        )
        span = None
        for pos in hits:
            if span and pos <= span[1] + 1:  # overlaps or touches span end
                span = (span[0], max(span[1], pos + k - 1), span[2] + 1)
            else:
                if span:
                    out.add((doc_id, *span))
                span = (pos, pos + k - 1, 1)
        if span:
            out.add((doc_id, *span))
    return {
        (d, s, e, e - s + 1, n) for (d, s, e, n) in out
    }


def _run(spark, texts, k):
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    got = {
        (r["doc_id"], r["start_word"], r["end_word"], r["n_words"], r["n_grams"])
        for r in duplicate_spans(df, k=k).collect()
    }
    assert got == _py_spans(texts, k), (got, _py_spans(texts, k))


def test_cross_doc_duplicate_span(spark):
    shared = "the quick brown fox jumps over the lazy dog again"
    _run(
        spark,
        [f"intro one {shared} outro alpha", f"intro two {shared} outro beta"],
        k=5,
    )


def test_within_doc_repetition_counts(spark):
    text = "a b c d e x y z a b c d e"
    _run(spark, [text], k=5)


def test_adjacent_hits_merge_into_one_span(spark):
    # two docs share a LONG range -> many overlapping k-shingles, one span
    shared = " ".join(f"w{i}" for i in range(30))
    _run(spark, [f"pre {shared} post", f"left {shared} right"], k=10)


def test_disjoint_spans_stay_separate(spark):
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    _run(
        spark,
        [f"{a} unique middle section here {b}", f"{a} other padding words {b}"],
        k=10,
    )


def test_no_duplicates_no_rows(spark):
    _run(spark, ["all words unique here today", "completely different text now"],
         k=3)


def test_short_docs_skipped(spark):
    _run(spark, ["tiny", "tiny"], k=5)  # < k words -> no shingles at all


def test_random_docs_match_oracle(spark):
    rng = random.Random(99)
    vocab = [f"t{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for _ in range(20)
    ]
    _run(spark, texts, k=4)
