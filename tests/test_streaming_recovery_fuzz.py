"""Streaming checkpoint recovery + random-document-shape fuzz
(round-3 verdict items 3 and 8).

Recovery: the ``applyInPandasWithState`` assembly operator is stopped with
every conversation's state OPEN (only half of each conversation's turns
ingested), then a NEW query resumes from the same checkpoint with the rest
of the turns — emitted documents must be byte-identical to the batch path,
proving per-conversation state survives a stop/restart.

Fuzz: random conversation shapes (adversarial text/tool strings, duplicate
turn_idx ties, variable lengths) through the stateful streaming path vs the
batch assembler — axis 11 of the quirk soak.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_BASE_TS = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _sentinel_rows(years=(2030, 2031)):
    return [
        (f"conv-sentinel-{y}", 0, "user", "late", None,
         dt.datetime(y, 1, 1, tzinfo=dt.timezone.utc))
        for y in years
    ]


def _run_available_now(spark, inp, ckpt, out_dir, max_files=1):
    from pyld_spark.streaming.stream import (
        assemble_documents_stream_stateful,
        read_transcript_stream,
    )

    stream = read_transcript_stream(spark, inp, max_files_per_trigger=max_files)
    docs = assemble_documents_stream_stateful(
        stream, watermark="96 hours", gap_seconds=1800
    )
    q = (
        docs.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True)
        .format("parquet").option("path", out_dir).start()
    )
    q.awaitTermination(300)
    assert not q.isActive


def _streamed_docs(spark, out_dir):
    return {
        r.conv_id: r.doc
        for r in spark.read.parquet(out_dir).collect()
        if "sentinel" not in r.conv_id
    }


def test_stateful_assembly_recovers_from_checkpoint(spark, tmp_path):
    """Stop with all conversation state open; resume on the same checkpoint;
    final documents byte-match batch — checkpoint recovery of the custom
    stateful operator (streaming/stream.py:195)."""
    from pyld_spark.transcripts import assemble_documents, synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=40, turns_per_conv=6,
                               hot_convs=0, hot_turns=0).cache()
    half = (F.col("turn_idx") % 2 == 0)
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # phase 1: even turns only — every conversation straddles the restart
    t.filter(half).write.mode("append").parquet(inp)
    _run_available_now(spark, inp, ckpt, out_dir)
    partial = _streamed_docs(spark, out_dir)

    # phase 2: NEW query object, SAME checkpoint — odd turns + watermark
    # sentinels (two microbatches: commit watermark, then fire timers)
    rest = t.filter(~half)
    rest.write.mode("append").parquet(inp)
    spark.createDataFrame(_sentinel_rows(), TRANSCRIPT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(inp)
    _run_available_now(spark, inp, ckpt, out_dir)

    streamed = _streamed_docs(spark, out_dir)
    batch = {r.conv_id: r.doc for r in assemble_documents(t).collect()}
    assert set(streamed) == set(batch)
    for conv_id, doc in streamed.items():
        assert doc == batch[conv_id], conv_id
    # the restart genuinely completed conversations (not all emitted early):
    assert len(partial) < len(streamed)


def test_recovered_state_not_duplicated(spark, tmp_path):
    """A third availableNow run on the same checkpoint with no new data must
    emit nothing new (idempotent resume — exactly-once per conversation)."""
    from pyld_spark.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=10, turns_per_conv=4,
                               hot_convs=0, hot_turns=0)
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    t.write.mode("append").parquet(inp)
    spark.createDataFrame(_sentinel_rows(), TRANSCRIPT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(inp)
    _run_available_now(spark, inp, ckpt, out_dir)
    first = _streamed_docs(spark, out_dir)
    _run_available_now(spark, inp, ckpt, out_dir)  # no new data
    second = _streamed_docs(spark, out_dir)
    assert first == second
    assert len(first) == 10


# ------------------------------------------------------------------- fuzz

_edgy_text = st.text(
    alphabet=st.sampled_from(
        list("ab \t\n\"\\{}[]:,\u00e9\u4e2d\U0001f600\u0000\u001f'`<>&")
    ),
    min_size=0, max_size=24,
)

_conversations = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),           # n_turns
        st.lists(_edgy_text, min_size=6, max_size=6),    # texts
        st.booleans(),                                    # has tool calls
        st.integers(min_value=0, max_value=1),           # duplicate turn_idx tie
    ),
    min_size=3, max_size=8,
)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(_conversations)
def test_random_shapes_stream_vs_batch(spark, tmp_path_factory, convs):
    """Random conversation shapes through the stateful streaming assembly:
    byte parity with batch, including duplicate-turn_idx tie-breaks and
    JSON-hostile text/tool content."""
    from pyld_spark.transcripts import assemble_documents

    rows = []
    for ci, (n_turns, texts, has_tool, dup) in enumerate(convs):
        for ti in range(n_turns):
            ts = _BASE_TS + dt.timedelta(minutes=ci * 7 + ti)
            text = texts[ti % len(texts)].replace("\x00", "")  # parquet-safe
            tool = f"tool_{ti}" if has_tool and ti % 2 else None
            rows.append((f"c{ci}", ti, "user" if ti % 2 == 0 else "assistant",
                         text, tool, ts))
        if dup and n_turns >= 2:
            # duplicate turn_idx 0 with different text: tie-break must agree
            rows.append((f"c{ci}", 0, "system", "dup-tie", None,
                         _BASE_TS + dt.timedelta(minutes=ci * 7, seconds=30)))

    tmp_path = tmp_path_factory.mktemp("sfz")
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    t.coalesce(2).write.mode("append").parquet(inp)
    spark.createDataFrame(_sentinel_rows(), TRANSCRIPT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(inp)
    _run_available_now(spark, inp, ckpt, out_dir, max_files=2)

    streamed = _streamed_docs(spark, out_dir)
    batch = {r.conv_id: r.doc for r in assemble_documents(t).collect()}
    assert streamed == batch
