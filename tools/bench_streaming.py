"""Streaming throughput: file-source replay of a synthetic transcript corpus
through the full Structured Streaming pipeline (session-window assembly →
mapInArrow expand/toRDF → parquet sink), timed end to end.

Protocol:
  0. (untimed) synthesize n_convs x turns transcripts → parquet in /dev/shm
     (32 files → 8 microbatches at maxFilesPerTrigger=4)
  1. (untimed) batch reference on the same session: assemble + triples count
  2. (timed) stream_triples with trigger availableNow; wall = start→
     awaitTermination; throughput = emitted triples / wall

Conversations still open under the watermark at end-of-replay stay in state
(correct semantics — a replay ends, a stream continues); they are reported
as emitted_fraction so the throughput denominator matches the numerator.

Run AFTER any other Spark work has stopped (box noise contaminates):
    python tools/bench_streaming.py [n_convs] [turns]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pyld_spark.operators.expand_stage import docs_to_triples, split_quarantine
    from pyld_spark.session import ensure_workers_can_import, get_spark
    from pyld_spark.streaming.stream import stream_triples
    from pyld_spark.transcripts import assemble_documents, synthesize_transcripts

    spark = get_spark("bench-streaming", cpus=32)
    ensure_workers_can_import(spark)
    base = "/dev/shm/bench-streaming"
    shutil.rmtree(base, ignore_errors=True)
    inp = base + "/transcripts"

    from pyspark.sql import functions as F

    # event-time-ordered replay: range-partition by ts so file k holds the
    # k-th time slice (files are written, hence discovered, in that order) —
    # a real stream delivers roughly in event order too, and this lets a
    # modest watermark close sessions progressively instead of stranding
    # them behind replay disorder
    t = synthesize_transcripts(spark, n_convs=n_convs, turns_per_conv=turns)
    t.repartitionByRange(32, F.col("ts")).sortWithinPartitions("ts").write.parquet(inp)
    # FileStreamSource orders batches by file modification time — stamp the
    # range-partitioned files (part-00000 = earliest slice) with ascending
    # mtimes so replay order == event-time order; otherwise the watermark
    # jumps to near-max on an early out-of-order file and everything earlier
    # is dropped as late
    import os

    parts = sorted(
        f for f in os.listdir(inp) if f.startswith("part-")
    )
    t_base = time.time() - 3600
    for i, f in enumerate(parts):
        os.utime(os.path.join(inp, f), (t_base + i, t_base + i))
    n_turns = spark.read.parquet(inp).count()

    # batch reference (also warms executors + python workers)
    t0 = time.perf_counter()
    docs = assemble_documents(spark.read.parquet(inp))
    batch_triples, _ = split_quarantine(docs_to_triples(docs))
    n_batch = batch_triples.count()
    batch_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    q = stream_triples(
        spark, inp, base + "/ckpt", output_path=base + "/out",
        watermark="30 minutes", gap="30 minutes", max_files_per_trigger=8,
    )
    q.awaitTermination(1800)
    stream_wall = time.perf_counter() - t0
    out = spark.read.parquet(base + "/out")
    n_stream = out.filter("error_code is null").count()

    # a replay ENDS but a stream continues: sessions still open under the
    # watermark at end-of-replay sit in state until later data arrives.
    # Flush them with two far-future sentinel turns in separate microbatches
    # on the same checkpoint (untimed — models the continuing stream).
    import datetime as dt

    for i, year in enumerate((2030, 2031)):
        sdir = inp
        spark.createDataFrame(
            [(f"conv-sentinel-{year}", 0, "user", "late", None,
              dt.datetime(year, 1, 1, tzinfo=dt.timezone.utc))],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(sdir)
        newest = max(
            (f for f in os.listdir(sdir) if f.startswith("part-")),
            key=lambda f: os.path.getmtime(os.path.join(sdir, f)),
        )
        os.utime(os.path.join(sdir, newest),
                 (t_base + 1000 + i, t_base + 1000 + i))
    t1 = time.perf_counter()
    q2 = stream_triples(
        spark, inp, base + "/ckpt", output_path=base + "/out",
        watermark="30 minutes", gap="30 minutes", max_files_per_trigger=1,
    )
    q2.awaitTermination(1800)
    flush_wall = time.perf_counter() - t1
    out = spark.read.parquet(base + "/out")
    n_flushed = out.filter(
        "error_code is null and subj not like '%sentinel%'"
        " and obj_value not like '%sentinel%'"
    ).count()

    print(json.dumps({
        "n_turns": n_turns,
        "batch": {"triples": n_batch, "wall_sec": round(batch_wall, 3),
                  "triples_per_sec": round(n_batch / batch_wall, 1)},
        "streaming": {"triples": n_stream, "wall_sec": round(stream_wall, 3),
                      "triples_per_sec": round(n_stream / stream_wall, 1),
                      "emitted_fraction": round(n_stream / n_batch, 4),
                      "flush_wall_sec": round(flush_wall, 3),
                      "emitted_after_flush": round(n_flushed / n_batch, 4),
                      "triples_per_sec_incl_flush": round(
                          n_flushed / (stream_wall + flush_wall), 1)},
        "stream_vs_batch": round(
            (n_flushed / (stream_wall + flush_wall))
            / (n_batch / batch_wall), 3
        ),
    }))
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
