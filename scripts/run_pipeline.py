"""spark-submit entry point for the full KG-construction pipeline.

Usage (local sandbox):

    spark-submit --py-files "$(python -c 'import sys; sys.path.insert(0,".");
        from pyld_spark.session import package_zip; print(package_zip())')" \
        scripts/run_pipeline.py --sf-dir /root/testdata/sf0.1 \
        --workdir /tmp/kg_run

On a cluster the same invocation works with ``--master yarn``/k8s — the
pipeline's only local assumption is the parquet workdir (swap for an Iceberg
catalog via the Pipeline class).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.01"))
    ap.add_argument("--workdir", default="/tmp/kg_pipeline_run")
    ap.add_argument("--run-id", default="run")
    ap.add_argument("--bucket-input", action="store_true",
                    help="materialize the input bucketed by conv_id first "
                         "(production layout; assembly then has no exchange)")
    ap.add_argument("--synthetic-convs", type=int, default=0,
                    help="if >0, use the synthetic generator at this size "
                         "instead of events-derived transcripts")
    ap.add_argument("--incremental", action="store_true",
                    help="delta ingest: process only conversations missing "
                         "from the existing workdir outputs and append them "
                         "(falls back to a full run on an empty workdir)")
    args = ap.parse_args()

    from pyld_spark.plans.pipeline import Pipeline
    from pyld_spark.session import get_spark
    from pyld_spark.transcripts import synthesize_transcripts, transcripts_from_events

    spark = get_spark("kg_pipeline")
    spark.sparkContext.setLogLevel("WARN")
    if args.synthetic_convs > 0:
        transcripts = synthesize_transcripts(spark, n_convs=args.synthetic_convs)
    else:
        transcripts = transcripts_from_events(spark, args.sf_dir)
    pipe = Pipeline(spark, args.workdir, run_id=args.run_id)
    if args.incremental:
        outputs = pipe.run_incremental(transcripts)
    else:
        outputs = pipe.run(transcripts, bucket_input=args.bucket_input)
    for stage, df in outputs.items():
        print(f"{stage}: {df.count()} rows -> {os.path.join(args.workdir, stage)}")
    print("lineage:")
    for r in pipe.lineage().orderBy("stage").collect():
        print(f"  {r.run_id}/{r.stage}: rows_out={r.rows_out} "
              f"errors={r.error_rows} wall_ms={r.wall_ms}")
    spark.stop()


if __name__ == "__main__":
    main()
