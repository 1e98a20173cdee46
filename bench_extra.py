"""Auxiliary benchmark (bench.py stays frozen — guide §1.4 isolation runs
live here): times EVERY declared query in __spark_entry__.queries() with the
noop sink, so the computation is measured without a collect/driver sink.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [name ...]

Prints one JSON line: {"queries": {name: best_sec}, "sf_dir": ..., "trials": N}.
Two trials per query, min kept (same shared-box rationale as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("BENCH_EXTRA_TRIALS", "2"))
    only = set(sys.argv[1:])

    import __spark_entry__ as e
    from pyld_spark.session import ensure_workers_can_import, get_spark

    spark = get_spark("pyld_spark_bench_extra")
    ensure_workers_can_import(spark)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = float("inf")
        try:
            for _ in range(trials):
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001
            results[name] = f"ERR: {type(ex).__name__}: {ex}"[:200]
        finally:
            spark.sparkContext.setJobDescription(None)
        print(f"# {name}: {results[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"queries": results, "sf_dir": sf_dir, "trials": trials}))
    spark.stop()


if __name__ == "__main__":
    main()
