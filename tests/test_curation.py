"""Unit tests for the composed curation ledger (operators/curation.py).

The ledger's per-stage semantics are each gate-certified on their own
(language_id, quality_score, exact_dedup, hash_split, ngram_decontaminate);
these tests pin the COMPOSITION contract: one row per input doc, the
first-failing-stage reason ladder, and keep ⇔ reason == 'kept'.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyld_spark.operators.curation import curate_documents

EN = (
    "the quick brown fox jumps over the lazy dog and then the dog sleeps "
    "while the fox runs away into the quiet green forest with many trees"
)
FR = (
    "le renard brun rapide saute par dessus le chien paresseux et puis le "
    "chien dort pendant que le renard court dans la foret verte et calme"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_ledger_one_row_per_doc_and_keep_iff_kept(spark):
    rows = [(f"d{i:03d}", f"{EN} variant {i}") for i in range(40)]
    rows.append(("dup_a", EN))
    rows.append(("dup_b", EN))
    rows.append(("fr_doc", FR))
    # English stopwords (passes lang) but short + punctuation-heavy
    # (quality 0.372 < 0.5)
    rows.append(("short", "the and the of!!! to,,, in??? is... it;;; the!!!"))
    out = curate_documents(_docs(spark, rows)).cache()
    try:
        assert out.count() == len(rows)
        assert out.select("doc_id").distinct().count() == len(rows)
        mismatch = out.where(
            F.col("keep") != (F.col("reason") == F.lit("kept"))
        ).count()
        assert mismatch == 0
        got = {r["doc_id"]: r.asDict() for r in out.collect()}
        assert got["fr_doc"]["reason"] == "lang"
        assert got["short"]["reason"] == "quality"
        # exact duplicates: min-doc_id survivor keeps (or fails a later
        # stage); the other is dropped as exact_dup unless an earlier
        # stage already claimed it.
        assert got["dup_b"]["is_duplicate"] is True
        assert got["dup_b"]["reason"] == "exact_dup"
        assert got["dup_a"]["is_duplicate"] is False
    finally:
        out.unpersist()


def test_ladder_precedence_lang_beats_duplicate(spark):
    # Both French docs are exact duplicates of each other; 'lang' outranks
    # 'exact_dup' in the first-match ladder.
    out = curate_documents(
        _docs(spark, [("a", FR), ("b", FR), ("c", EN)])
    )
    got = {r["doc_id"]: r["reason"] for r in out.collect()}
    assert got["a"] == "lang"
    assert got["b"] == "lang"


def test_holdout_docs_never_kept(spark):
    rows = [(f"h{i:04d}", f"{EN} item {i}") for i in range(300)]
    out = curate_documents(_docs(spark, rows)).cache()
    try:
        holdout = out.where(F.col("split") != "train")
        assert holdout.count() > 0  # 10% expected at n=300
        assert holdout.where(F.col("keep")).count() == 0
        # every holdout doc that passed lang/quality/dup shows 'holdout'
        assert (
            holdout.where(
                (F.col("pred_lang") == "en")
                & (F.col("quality") >= 0.5)
                & (~F.col("is_duplicate"))
                & (F.col("reason") != "holdout")
            ).count()
            == 0
        )
    finally:
        out.unpersist()


def test_contamination_flag_independent_of_other_stages(spark):
    # Force a train doc to share a 3-gram with a test doc: contamination is
    # computed over the FULL train split, so even a doc dropped earlier
    # still carries an honest `contaminated` flag.
    rows = [(f"c{i:04d}", f"{EN} row {i}") for i in range(400)]
    out = curate_documents(_docs(spark, rows), decontaminate_n=3).cache()
    try:
        train = out.where(F.col("split") == "train")
        # shared EN prefix means every train doc shares 3-grams with any
        # test doc → all train docs contaminated, none kept
        if out.where(F.col("split") == "test").count() > 0:
            assert train.where(~F.col("contaminated")).count() == 0
        # holdout docs have no contamination verdict (left join → False)
        assert (
            out.where(
                (F.col("split") != "train") & F.col("contaminated")
            ).count()
            == 0
        )
    finally:
        out.unpersist()


def test_ledger_single_corpus_exchange_plan(spark, sf_dir):
    """Round-5 verdict item 7 plan pin: the composed 5-stage ledger pays
    exactly ONE full-corpus exchange (the content-hash window); the
    per-row stages are columns on one projection (no doc_id self-joins —
    the pre-round-5 shape paid five corpus exchanges), and the
    contamination join is broadcast (contamination-sized right side)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = curate_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(content_hash") == 1, plan
    # the only other hash exchanges are contamination-sized (eval grams +
    # hit doc_ids); the corpus never exchanges on doc_id
    assert plan.count("Exchange hashpartitioning") == 3, plan
    assert "SortMergeJoin" not in plan, plan
