"""Gopher repetition signals vs a pure-Python per-doc oracle."""

import random
import re
from collections import Counter

import pytest

from pyld_spark.operators.repetition import (
    DUP_NS,
    THRESHOLDS,
    TOP_NS,
    repetition_stats,
)


def _py_stats(text):
    out = {}

    def unit_fracs(units, prefix):
        c = Counter(units)
        total = sum(c.values())
        chars = sum(len(u) * k for u, k in c.items())
        dup = sum(k - 1 for k in c.values())
        dup_chars = sum(len(u) * (k - 1) for u, k in c.items())
        out[f"dup_{prefix}_frac"] = round(dup / total, 6) if total else 0.0
        out[f"dup_{prefix}_char_frac"] = (
            round(dup_chars / chars, 6) if chars else 0.0
        )

    unit_fracs([x for x in text.split("\n") if x], "line")
    unit_fracs([x for x in re.split(r"\n{2,}", text) if x], "para")
    words = [w for w in re.split(r"\s+", text.lower()) if w]
    n_chars = len(text)
    for n in (*TOP_NS, *DUP_NS):
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        key = (
            f"top_{n}gram_char_frac" if n in TOP_NS else f"dup_{n}gram_char_frac"
        )
        if not grams or not n_chars:
            out[key] = 0.0
        elif n in TOP_NS:
            out[key] = round(max(k * len(g) for g, k in grams.items()) / n_chars, 6)
        else:
            out[key] = round(
                sum(k * len(g) for g, k in grams.items() if k > 1) / n_chars, 6
            )
    out["repetition_flag"] = any(out[c] > t for c, t in THRESHOLDS.items())
    return out


def _run(spark, texts):
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        want = _py_stats(t)
        row = got[f"d{i}"]
        row.pop("doc_id")
        assert row == pytest.approx(want), (i, t, row, want)


def test_clean_doc_scores_low(spark):
    _run(spark, ["the quick brown fox jumps over the lazy dog\nanother line"])


def test_repeated_lines(spark):
    text = "hello world\nhello world\nhello world\nunique line"
    _run(spark, [text])


def test_repeated_paragraphs_and_flag(spark):
    para = "spam spam spam spam spam"
    text = ("\n\n".join([para] * 5)) + "\n\nok"
    df_texts = [text]
    _run(spark, df_texts)
    # and the flag is actually raised for this blatantly repetitive doc
    assert _py_stats(text)["repetition_flag"] is True


def test_degenerate_docs(spark):
    _run(spark, ["", "word", "a b", "\n\n\n", "   "])


def test_random_docs_match_oracle(spark):
    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz"]
    texts = []
    for _ in range(30):
        lines = []
        for _ in range(rng.randrange(1, 8)):
            lines.append(
                " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
            )
            if rng.random() < 0.3:
                lines.append(lines[-1])  # inject duplicate lines
            if rng.random() < 0.2:
                lines.append("")  # paragraph break
        texts.append("\n".join(lines))
    _run(spark, texts)


def test_one_row_per_doc(spark):
    df = spark.createDataFrame(
        [("a", "x y x y"), ("b", "")], "doc_id string, text string"
    )
    out = repetition_stats(df)
    assert out.count() == 2
    assert len(out.columns) == 2 + 4 + len(TOP_NS) + len(DUP_NS)
