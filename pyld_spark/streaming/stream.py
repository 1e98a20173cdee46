"""Structured Streaming path: transcript stream → incremental triple emission.

Streaming analogue of the batch flagship (SURVEY.md §2.11 — streaming is an
implementation tool here, the reference has no streaming surface):

- transcripts arrive as files (or Kafka on a real deployment);
- a watermark on ``ts`` bounds conversation-assembly state;
- session-complete conversations are assembled with the same
  ``sort_array(collect_list(struct(...)))`` aggregation (append mode emits a
  conversation only once its watermark passes — late turns within the
  watermark still make it in);
- the same ``docs_to_triples`` mapInPandas stage runs on the streaming
  DataFrame unchanged — Spark plans it incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def assemble_documents_stream(
    transcripts: DataFrame, watermark: str = "10 minutes",
    gap: str = "30 minutes",
) -> DataFrame:
    """Streaming assembly: watermark + session window per conversation.

    A conversation document is emitted when its session window closes under
    the watermark (i.e., no new turn for ``gap`` and event time has moved
    past the window end + watermark)."""
    import json as _json

    from pyld_spark.transcripts import TRANSCRIPT_CONTEXT, conv_iri, turn_iri

    ctx_prefix = (
        '{"@context":' + _json.dumps(TRANSCRIPT_CONTEXT, sort_keys=True) + ',"@id":"'
    )
    with_iri = transcripts.withWatermark("ts", watermark).withColumn(
        "turn_iri", turn_iri(F.col("conv_id"), F.col("turn_idx"))
    )
    agg = with_iri.groupBy(
        F.col("conv_id"), F.session_window(F.col("ts"), gap)
    ).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("turn_idx").alias("turnIndex"),
                    F.col("role").alias("role"),
                    F.col("text").alias("text"),
                    F.col("tool").alias("tool"),
                    F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("ts"),
                    F.col("turn_iri").alias("@id"),
                )
            )
        ).alias("turns")
    )
    turn_json = F.transform(
        F.col("turns"),
        lambda t: F.to_json(
            F.struct(
                t["@id"].alias("@id"),
                F.lit("Turn").alias("@type"),
                t["turnIndex"].alias("turnIndex"),
                t["role"].alias("role"),
                t["text"].alias("text"),
                t["tool"].alias("tool"),
                t["ts"].alias("ts"),
            )
        ),
    )
    doc = F.concat(
        F.lit(ctx_prefix),
        conv_iri(F.col("conv_id")),
        F.lit('","@type":"Conversation","turns":{"@list":['),
        F.array_join(turn_json, ","),
        F.lit("]}}"),
    )
    return agg.select("conv_id", doc.alias("doc"))


def stream_triples(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    output_path: str | None = None,
    watermark: str = "10 minutes",
    gap: str = "30 minutes",
):
    """Wire the full streaming pipeline; returns the StreamingQuery.

    With ``output_path`` → parquet sink; else an in-memory sink named
    ``stream_triples`` (tests)."""
    from pyld_spark.operators.expand_stage import docs_to_triples
    from pyld_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    transcripts = read_transcript_stream(spark, input_path)
    docs = assemble_documents_stream(transcripts, watermark, gap)
    triples = docs_to_triples(docs)
    writer = (
        triples.writeStream.option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if output_path is not None:
        return writer.format("parquet").option("path", output_path).start()
    return writer.format("memory").queryName("stream_triples").start()
