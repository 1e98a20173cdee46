"""TF-IDF top-terms and BM25 scoring (operators/keywords.py), verified
against an exact pure-Python replay of the same formulas."""

from __future__ import annotations

import math
from collections import Counter

import pytest

DOCS = [
    (1, "spark shuffles data across the cluster the shuffle is costly"),
    (2, "broadcast joins avoid the shuffle for small tables"),
    (3, "the the the spark spark plan"),
    (4, "a window ranks rows per partition without a full sort"),
    (5, "empty   whitespace\tonly\n  document tail "),
]


def _toks(text):
    return [t for t in text.lower().split() if t]


def _py_tfidf(rows, k):
    n = len(rows)
    df = Counter()
    for _, text in rows:
        df.update(set(_toks(text)))
    out = []
    for doc_id, text in rows:
        toks = _toks(text)
        cnt = Counter(toks)
        scored = []
        for term, tf in cnt.items():
            idf = math.log((n + 1.0) / (df[term] + 1.0)) + 1.0
            scored.append((round(tf / len(toks) * idf, 6), term))
        scored.sort(key=lambda s: (-s[0], s[1]))
        for rank, (score, term) in enumerate(scored[:k], start=1):
            out.append((doc_id, rank, term, score))
    return sorted(out)


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    terms = sorted({t.lower() for t in terms})
    n = len(rows)
    lens = {d: len(_toks(t)) for d, t in rows}
    avgdl = sum(lens.values()) / n
    df = Counter()
    for _, text in rows:
        df.update(set(_toks(text)) & set(terms))
    out = []
    for doc_id, text in rows:
        cnt = Counter(t for t in _toks(text) if t in terms)
        if not cnt:
            continue
        score = 0.0
        for term, tf in cnt.items():
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * lens[doc_id] / avgdl))
        out.append((doc_id, len(cnt), round(score, 6)))
    return sorted(out)


def test_tfidf_matches_python_replay(spark):
    from pyld_spark.operators.keywords import tfidf_top_terms

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.rank, r.term, r.tfidf_r6)
        for r in tfidf_top_terms(df, k=3).collect()
    )
    assert got == _py_tfidf(DOCS, k=3)


def test_tfidf_rank_contract(spark):
    from pyld_spark.operators.keywords import tfidf_top_terms

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # rounded-score DESC, term ASC — the oracle's exact ordering
        keys = [(-r.tfidf_r6, r.term) for r in rs]
        assert keys == sorted(keys)
        assert len(rs) <= 2


def test_tfidf_idf_floor(spark):
    # a term in every doc still scores > 0 (smooth idf)
    from pyld_spark.operators.keywords import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta")], ["doc_id", "text"])
    rows = tfidf_top_terms(df, k=5).collect()
    assert all(r.tfidf_r6 > 0 for r in rows)
    # rarer term outranks the shared one at equal tf
    by_doc1 = sorted((r.rank, r.term) for r in rows if r.doc_id == 1)
    assert by_doc1[0][1] == "alpha"


def test_bm25_matches_python_replay(spark):
    from pyld_spark.operators.keywords import bm25_scores

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    query = ["shuffle", "spark", "BROADCAST"]
    got = sorted(
        (r.doc_id, r.n_matched, r.bm25_r6)
        for r in bm25_scores(df, query).collect()
    )
    assert got == _py_bm25(DOCS, query)
    # docs with no query term are omitted
    assert {g[0] for g in got} == {1, 2, 3}


def test_bm25_empty_query_raises(spark):
    from pyld_spark.operators.keywords import bm25_scores

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_scores(df, [])


def test_bm25_length_normalisation(spark):
    # same tf, longer doc → lower score (b > 0 penalises length)
    from pyld_spark.operators.keywords import bm25_scores

    df = spark.createDataFrame(
        [(1, "needle " + "hay " * 50), (2, "needle hay")],
        ["doc_id", "text"])
    out = {r.doc_id: r.bm25_r6 for r in bm25_scores(df, ["needle"]).collect()}
    assert out[2] > out[1]


def test_tfidf_plan_shape(spark):
    # the rank <= k cut must compile to the two-phase WindowGroupLimit
    from pyld_spark.operators.keywords import tfidf_top_terms

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = tfidf_top_terms(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
