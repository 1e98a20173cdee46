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

Scale shape: language/quality/split are pure column expressions (zero
shuffle); exact dedup is one shuffle on the content hash; decontamination
explodes train-side n-grams against a distinct-ed eval gram table that
Catalyst broadcasts (eval sets are tiny next to the corpus). The ledger
joins are all doc_id-equi — co-partitioned after the first exchange, and
the whole composition stays linear in corpus size: nothing quadratic,
nothing driver-side.

Reference analogue: none (builder's-brief LLM-data-pipeline axis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyld_spark.operators.dedup import exact_dedup
from pyld_spark.operators.sampling import hash_split
from pyld_spark.operators.textprep import ngram_decontaminate
from pyld_spark.operators.textstats import language_id, quality_score


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
    split = hash_split(documents, id_col, weights)
    langs = language_id(documents, text_col, id_col).select(id_col, "pred_lang")
    qual = quality_score(documents, text_col, id_col)
    dup = exact_dedup(documents, text_col, id_col).select(id_col, "is_duplicate")
    contam = ngram_decontaminate(
        split.where(F.col("split") == "train"),
        split.where(F.col("split") == "test"),
        n=decontaminate_n,
        text_col=text_col,
        id_col=id_col,
    ).select(id_col, "contaminated")
    base = (
        split.select(id_col, "split")
        .join(langs, id_col)
        .join(qual, id_col)
        .join(dup, id_col)
        .join(contam, id_col, "left")
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
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
