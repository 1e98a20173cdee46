"""End-to-end training-corpus curation: one ledger row per document.

Chains the individually gate-certified curation primitives — language ID,
quality scoring, exact dedup, hash splitting, n-gram decontamination — into
the keep/drop decision a real pretraining pipeline makes, with the FIRST
failing stage recorded as the drop reason (a lineage ledger, not just a
filtered corpus: ablating one stage is a one-column filter change, and
per-reason drop counts fall out of a groupBy).

Reason ladder (first match wins): ``lang`` → ``quality`` → ``exact_dup`` →
``holdout`` (val/test docs are never training keeps) → ``contaminated`` →
``kept``. Decontamination is computed over the FULL train split (not the
post-filter survivors) so the flag is independent of the other stages —
conservative, and it keeps every stage independently auditable.

Scale shape (round-5 rewrite, verdict item 7): language/quality/split fold
into ONE projection as column expressions (pred_lang_expr / quality_expr /
hash_split — zero shuffle, zero joins); the duplicate flag is a window
min over the content hash — the composition's single full-corpus
exchange; decontamination explodes train-side n-grams against a
distinct-ed eval gram table that Catalyst broadcasts, and its result is
contamination-sized (hits_only), so the final left join broadcasts too.
Before the rewrite every per-row stage re-joined the corpus on doc_id —
five full exchanges where one suffices. Linear, nothing driver-side.

Reference analogue: none (builder's-brief LLM-data-pipeline axis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyld_spark.operators.sampling import hash_split
from pyld_spark.operators.textprep import ngram_decontaminate
from pyld_spark.operators.textstats import pred_lang_expr, quality_expr


def curate_documents(
    documents: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    split_weights: dict[str, float] | None = None,
    decontaminate_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per input document: (doc_id, split, pred_lang, quality,
    is_duplicate, contaminated, reason, keep)."""
    weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    # every per-row stage as a column on ONE projection — no joins
    enriched = (
        hash_split(documents.select(id_col, text_col), id_col, weights)
        .withColumn("pred_lang", pred_lang_expr(text_col))
        .withColumn("quality", quality_expr(text_col))
        .withColumn("content_hash", F.md5(F.col(text_col)))
    )
    # contamination-sized result (docs with ≥1 eval-gram hit): the join
    # back is broadcast-able instead of a corpus exchange
    contam = (
        ngram_decontaminate(
            enriched.where(F.col("split") == "train"),
            enriched.where(F.col("split") == "test"),
            n=decontaminate_n,
            text_col=text_col,
            id_col=id_col,
            hits_only=True,
        )
        .select(id_col, F.lit(True).alias("contaminated"))
    )
    # duplicate flag via window min over the content hash: the ONE
    # full-corpus exchange in the whole composition
    w = Window.partitionBy("content_hash")
    base = (
        enriched
        .withColumn("is_duplicate", F.col(id_col) != F.min(id_col).over(w))
        .join(contam, id_col, "left")
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
        .select(
            id_col, "split", "pred_lang", "quality", "is_duplicate",
            "contaminated",
        )
    )
    reason = (
        F.when(F.col("pred_lang") != lang, F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .when(F.col("is_duplicate"), F.lit("exact_dup"))
        .when(F.col("split") != "train", F.lit("holdout"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return base.withColumn("reason", reason).withColumn(
        "keep", F.col("reason") == "kept"
    )
