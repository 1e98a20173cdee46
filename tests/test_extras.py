"""Training-data extras: dedup, similarity, text analysis, multimodal."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark):
    from pyld_spark.operators.dedup import exact_dedup

    df = _docs(spark, [(1, "same text"), (2, "same text"), (3, "other")])
    out = {r.doc_id: r for r in exact_dedup(df).collect()}
    assert out[1].is_duplicate is False and out[1].survivor_id == 1
    assert out[2].is_duplicate is True and out[2].survivor_id == 1
    assert out[3].is_duplicate is False


def test_ngram_jaccard_and_minhash_agree(spark):
    from pyld_spark.operators.dedup import minhash_dedup_pairs, ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " slightly changed"),          # near-dup of 1
        (3, "completely different content here about spark engines"),
        (4, base),                                 # exact dup of 1
    ]
    df = _docs(spark, rows)
    exact_pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert (1, 4) in exact_pairs and exact_pairs[(1, 4)] == 1.0
    assert (1, 2) in exact_pairs
    assert not any(3 in p for p in exact_pairs)
    mh_pairs = {
        (r.doc_a, r.doc_b) for r in minhash_dedup_pairs(df, threshold=0.5).collect()
    }
    # minhash must find the exact dup; the near-dup with high probability
    assert (1, 4) in mh_pairs
    assert (1, 2) in mh_pairs
    assert not any(3 in p for p in mh_pairs)


def test_simhash_near_pairs(spark):
    from pyld_spark.operators.dedup import simhash_near_pairs, simhash_signatures

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _docs(spark, [(1, base), (2, base + " mu"), (3, "x y z entirely other words")])
    sigs = simhash_signatures(df)
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(sigs, max_hamming=10).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_similarity_topk(spark):
    from pyld_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
        quantized_dot_topk,
    )

    import math

    rows = []
    for i in range(50):
        angle = i * 0.1
        rows.append((i, [math.cos(angle), math.sin(angle), 0.1, 0.2]))
    embs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = embs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = brute_force_topk(embs, queries, k=5).collect()
    assert [r.neighbor_id for r in bf][0] == 0  # self is nearest
    assert all(bf[i].cosine >= bf[i + 1].cosine for i in range(len(bf) - 1))
    qd = quantized_dot_topk(embs, queries, k=5).collect()
    assert [r.neighbor_id for r in qd][0] == 0
    lsh = lsh_bucketed_topk(embs, queries, dim=4, k=5, n_planes=4).collect()
    assert lsh and lsh[0].neighbor_id == 0  # self always shares its bucket


def test_text_stats_and_quality(spark):
    from pyld_spark.operators.textstats import language_id, quality_score, text_stats

    df = _docs(spark, [
        (1, "The quick brown fox is on the hill and it is fine."),
        (2, "!!! ??? ,,,"),
        (3, "der hund ist und das haus die katze"),
    ])
    st = {r.doc_id: r for r in text_stats(df).collect()}
    assert st[1].n_tokens == 12
    assert st[1].stopword_ratio > 0.2
    assert st[2].punct_ratio > 0.5
    q = {r.doc_id: r.quality for r in quality_score(df).collect()}
    assert q[1] > q[2]
    lang = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert lang[1] == "en" and lang[3] == "de" and lang[2] == "und"


def test_doc_fingerprint_order_insensitive(spark):
    from pyld_spark.operators.textstats import doc_fingerprint

    df = _docs(spark, [(1, "abc def ghi"), (2, "abc def ghi"), (3, "zzz")])
    fp = {r.doc_id: r.fingerprint for r in doc_fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_multimodal_plumbing(spark):
    from pyld_spark.operators.multimodal import (
        attach_fake_payload,
        decode_image_stub,
        extract_binary_features,
        sample_frames_stub,
    )

    docs = spark.createDataFrame(
        [(0, "image doc"), (1, "audio doc"), (2, "video doc"), (3, "more image")],
        ["doc_id", "text"],
    )
    media = attach_fake_payload(docs).cache()
    feats = {r.doc_id: r for r in extract_binary_features(media).collect()}
    assert feats[0].n_bytes == len("image doc") * 2
    assert feats[0].prefix_hex == b"image do".hex()
    decoded = decode_image_stub(media, fake=True).collect()
    assert {r.doc_id for r in decoded} == {0, 3}
    assert all(r.out_width <= 224 for r in decoded)
    frames = sample_frames_stub(media, fake=True).collect()
    assert all(r.doc_id == 2 for r in frames) and frames
    # fake payloads are text bytes, not RIFF/PNG: the REAL decoder (present
    # since the codecs module landed) rejects them by signature
    with pytest.raises(Exception, match="not a PNG"):
        decode_image_stub(media, fake=False).collect()
