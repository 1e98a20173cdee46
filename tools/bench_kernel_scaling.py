"""Raw (no-Spark) kernel scaling control: run K worker processes, each
expanding the same transcript docs through _doc_to_quads, and report
aggregate quads/s at K and 4K processes plus the efficiency ratio.

This bounds what ANY Spark configuration can achieve on this box — if the
pure kernel scales at X from 2→8 processes, the Spark triples stage cannot
be expected to beat X.

    python tools/bench_kernel_scaling.py [docs_per_proc] [turns]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, "/root/repo")


def make_doc(conv: str, n_turns: int) -> str:
    from pyld_spark.transcripts import TRANSCRIPT_CONTEXT

    turns = [
        {
            "@id": f"https://pyld-spark.example/conv/{conv}/turn/{i}",
            "@type": "Turn",
            "turnIndex": i,
            "role": "user",
            "text": f"click value=3.5 props=x @user{conv} https://ex.org/e/{i}",
            "tool": "checkout" if i % 5 == 0 else None,
            "ts": "2020-01-01T00:00:00.000000Z",
        }
        for i in range(n_turns)
    ]
    return json.dumps(
        {
            "@context": TRANSCRIPT_CONTEXT,
            "@id": f"https://pyld-spark.example/conv/{conv}",
            "@type": "Conversation",
            "turns": {"@list": turns},
        }
    )


def worker(n_docs: int, turns: int, out):
    from pyld_spark.operators.expand_stage import _doc_to_quads

    docs = [make_doc(f"conv-{i}", turns) for i in range(n_docs)]
    for d in docs[:5]:
        _doc_to_quads(d, None)  # warm caches
    t0 = time.perf_counter()
    n = 0
    for d in docs:
        n += len(_doc_to_quads(d, None))
    out.put((n, time.perf_counter() - t0))


def run_level(k: int, n_docs: int, turns: int) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(n_docs, turns, q)) for _ in range(k)
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    total = sum(n for n, _ in results)
    return total / wall


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    best = {2: 0.0, 8: 0.0}
    for _ in range(3):
        for k in (2, 8):  # alternate levels
            best[k] = max(best[k], run_level(k, n_docs, turns))
    print(
        json.dumps(
            {
                "quads_per_sec": {str(k): round(v, 1) for k, v in best.items()},
                "efficiency_2_to_8": round(best[8] / best[2] / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
