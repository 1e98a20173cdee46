"""End-to-end KG-construction pipeline: staged, checkpointed, resumable, with
per-stage lineage rows (SURVEY.md §3.1 / §4.2; north_rule requirements).

Stages (each a checkpointed table write):
    assemble → link → triples (+quarantine) → canonicalize → entities →
    materialize

Sandbox note: checkpoints are parquet directories under ``workdir`` — the
drop-in for Iceberg tables on a real cluster (``writeTo(...).createOrReplace``
against a catalog; same layout, same resume logic via snapshot existence).
Resume: a stage whose output already exists (with ``_SUCCESS``) is skipped —
re-running the job after a failure re-executes only missing stages.

Lineage: every stage appends ``(run_id, stage, rows_out, error_rows, wall_ms)``
to ``workdir/lineage`` — the per-partition row counts live in the stage
outputs themselves (``doc_id`` is the partition witness).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Pipeline:
    def __init__(self, spark: SparkSession, workdir: str, run_id: str = "run"):
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id
        from pyld_spark.session import ensure_workers_can_import

        ensure_workers_can_import(spark)

    # -- checkpoint plumbing ------------------------------------------------

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def _read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def _write_lineage(self, stage: str, rows_out: int, error_rows: int, wall_ms: int):
        df = self.spark.createDataFrame(
            [(self.run_id, stage, rows_out, error_rows, wall_ms)],
            "run_id string, stage string, rows_out long, error_rows long, wall_ms long",
        )
        df.write.mode("append").parquet(os.path.join(self.workdir, "lineage"))

    def _stage(self, name: str, build, error_split=None) -> DataFrame:
        """Run one stage with resume + lineage. ``build()`` returns the stage
        DataFrame; ``error_split`` optionally splits (good, quarantine)."""
        if self._done(name):
            return self._read(name)
        t0 = time.perf_counter()
        df = build()
        err_rows = 0
        if error_split is not None:
            good, bad = error_split(df)
            bad.write.mode("overwrite").parquet(self._path(name + "_quarantine"))
            err_rows = self.spark.read.parquet(self._path(name + "_quarantine")).count()
            df = good
        df.write.mode("overwrite").parquet(self._path(name))
        out = self._read(name)
        self._write_lineage(
            name, out.count(), err_rows, int((time.perf_counter() - t0) * 1000)
        )
        return out

    # -- stages -------------------------------------------------------------

    TRANSCRIPT_DDL = (
        "conv_id STRING, turn_idx INT, role STRING, text STRING, "
        "tool STRING, ts TIMESTAMP"
    )

    def _bucketed_transcripts(self, transcripts: DataFrame, buckets: int) -> DataFrame:
        """Materialize the input bucketed+sorted by conv_id (the production
        Iceberg layout) so assembly plans with zero exchanges. On resume the
        bucketed table is re-registered over the existing files."""
        stage = "transcripts_bucketed"
        table = f"transcripts_bucketed_{self.run_id}"
        path = self._path(stage)
        if self._done(stage):
            self.spark.sql(f"DROP TABLE IF EXISTS {table}")
            self.spark.sql(
                f"CREATE TABLE {table} ({self.TRANSCRIPT_DDL}) USING parquet "
                f"CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx) "
                f"INTO {buckets} BUCKETS LOCATION '{path}'"
            )
            return self.spark.table(table)
        from pyld_spark.transcripts import write_bucketed_transcripts

        t0 = time.perf_counter()
        out = write_bucketed_transcripts(
            transcripts, self.spark, path, table=table, buckets=buckets
        )
        self._write_lineage(
            stage, out.count(), 0, int((time.perf_counter() - t0) * 1000)
        )
        return out

    def run(self, transcripts: DataFrame, bucket_input: bool = False,
            buckets: int = 64) -> dict[str, DataFrame]:
        from pyld_spark.operators.canonicalize import canonicalize_triples
        from pyld_spark.operators.expand_stage import docs_to_triples, split_quarantine
        from pyld_spark.operators.linking import (
            entity_table,
            extract_mentions,
            link_entities,
            mention_triples,
        )
        from pyld_spark.transcripts import assemble_documents

        if bucket_input:
            transcripts = self._bucketed_transcripts(transcripts, buckets)

        docs = self._stage("assemble", lambda: assemble_documents(transcripts))

        linked = self._stage(
            "link", lambda: link_entities(extract_mentions(transcripts))
        )

        triples = self._stage(
            "triples",
            lambda: docs_to_triples(docs),
            error_split=split_quarantine,
        )

        canonical = self._stage("canonicalize", lambda: canonicalize_triples(triples))

        entities = self._stage("entities", lambda: entity_table(linked))

        def build_materialize():
            link_trips = mention_triples(linked).withColumn(
                "doc_id", F.split(F.col("subj"), "/turn/")[0]
            ).select(
                "doc_id", "subj", "pred", "obj_kind", "obj_value",
                "obj_datatype", "obj_language", F.lit("@default").alias("graph"),
            )
            return canonical.unionByName(link_trips)

        materialized = self._stage("materialize", build_materialize)
        return {
            "assemble": docs,
            "link": linked,
            "triples": triples,
            "canonicalize": canonical,
            "entities": entities,
            "materialize": materialized,
        }

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, "lineage"))
