"""Scaling-efficiency evidence (BASELINE.json north_rule): run the identical
pipeline at two parallelism levels (local[8] vs local[32] — the sandbox proxy
for N vs 4N executors) on the same synthetic corpus and report throughput at
both plus efficiency = (throughput_32 / throughput_8) / 4.

Each level runs in a fresh subprocess (own JVM). Results go to stdout as JSON;
tools/record_bench.py formats them into BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_convs] [turns_per_conv]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyld_spark.session import get_spark, ensure_workers_can_import
from pyld_spark.transcripts import assemble_documents, synthesize_transcripts
from pyld_spark.operators.expand_stage import docs_to_triples, split_quarantine
from pyld_spark.operators.canonicalize import canonicalize_triples

cpus = {cpus}
spark = get_spark("scaling", cpus=cpus)
ensure_workers_can_import(spark)
spark.sparkContext.setLogLevel("ERROR")
t = synthesize_transcripts(spark, n_convs={n_convs}, turns_per_conv={turns}).cache()
n_turns = t.count()  # materialize input before the clock starts

# warm-up: spin up Python workers + JIT before the clock (one-time cost per
# executor; irrelevant at production stage lengths)
warm = assemble_documents(t.limit(2000))
split_quarantine(docs_to_triples(warm))[0].count()
canonicalize_triples(split_quarantine(docs_to_triples(warm))[0]).count()

t0 = time.perf_counter()
docs = assemble_documents(t)
triples, _ = split_quarantine(docs_to_triples(docs))
triples = triples.cache()
n_triples = triples.count()
t_triples = time.perf_counter() - t0
canon = canonicalize_triples(triples)
n_canon = canon.count()
t_total = time.perf_counter() - t0
print("RESULT " + json.dumps({{
    "cpus": cpus, "n_turns": n_turns, "n_triples": n_triples,
    "wall_triples": round(t_triples, 3), "wall_total": round(t_total, 3),
    "triples_per_sec": round(n_triples / t_triples, 1),
    "pipeline_triples_per_sec": round(n_triples / t_total, 1),
}}))
spark.stop()
"""


def run_level(cpus: int, n_convs: int, turns: int) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, n_convs=n_convs, turns=turns)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    trials = int(os.environ.get("SCALING_TRIALS", "2"))
    results = {}
    for cpus in (8, 32):
        best = None
        for _ in range(trials):  # best-of-N: one fresh JVM per trial
            r = run_level(cpus, n_convs, turns)
            if best is None or r["wall_total"] < best["wall_total"]:
                best = r
        results[cpus] = best
        print(json.dumps(best))
    eff = {
        "triples_stage": round(
            results[32]["triples_per_sec"] / results[8]["triples_per_sec"] / 4.0, 3
        ),
        "full_pipeline": round(
            results[32]["pipeline_triples_per_sec"]
            / results[8]["pipeline_triples_per_sec"] / 4.0, 3
        ),
    }
    print(json.dumps({"scaling_efficiency": eff, "levels": results}))


if __name__ == "__main__":
    main()
