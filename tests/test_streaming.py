"""Structured Streaming: transcript stream → incremental triples must match
the batch path for every conversation whose session window has closed.

Conversations whose last turn is within ``gap`` of the stream's max event
time stay open in state (correct watermark semantics) — they are excluded
from the comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyld_spark.streaming.stream import stream_triples
from pyld_spark.transcripts import synthesize_transcripts


def test_stream_triples_matches_batch(spark, tmp_path):
    from pyld_spark.operators.expand_stage import docs_to_triples, split_quarantine
    from pyld_spark.transcripts import assemble_documents

    # clustered conversations: each spans ~minutes, spaced 1 h apart
    t = synthesize_transcripts(spark, n_convs=60, turns_per_conv=8,
                               hot_convs=0, hot_turns=0).cache()
    inp = str(tmp_path / "stream_in")
    t.write.parquet(inp)

    q = stream_triples(
        spark, inp, str(tmp_path / "ckpt"),
        watermark="0 seconds", gap="30 minutes",
    )
    q.awaitTermination(300)
    streamed = spark.sql("select * from stream_triples").filter(
        "error_code is null"
    ).cache()

    max_ts = t.agg(F.max("ts")).collect()[0][0]
    closed_convs = {
        r.conv_id
        for r in t.groupBy("conv_id").agg(F.max("ts").alias("last"))
        .filter(F.col("last") <= F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES"))
        .collect()
    }
    assert len(closed_convs) >= 55  # all but the trailing conversation(s)

    batch, _ = split_quarantine(docs_to_triples(assemble_documents(
        t.filter(F.col("conv_id").isin(list(closed_convs)))
    )))
    batch = batch.cache()
    streamed_closed = streamed.filter(F.col("doc_id").isin(list(closed_convs)))
    assert streamed_closed.count() == batch.count() > 0
    cols = ["doc_id", "subj", "pred", "obj_kind", "obj_value", "obj_datatype"]
    assert streamed_closed.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(streamed_closed.select(cols)).count() == 0
