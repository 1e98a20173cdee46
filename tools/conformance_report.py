"""Print the conformance-sweep P/R table for BASELINE.md.

Usage: python tools/conformance_report.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conformance_harness import MANIFESTS, run_manifest  # noqa: E402


def main() -> None:
    total_tests = total_agree = 0
    rows = {}
    for name, fn in MANIFESTS:
        s = run_manifest(name, fn)
        total_tests += s.tests_total
        total_agree += s.tests_agree
        rows[name] = {
            "tests": s.tests_total,
            "agree": s.tests_agree,
            "pass_rate": round(s.pass_rate, 4),
        }
        if fn in ("to_rdf", "normalize"):
            rows[name]["precision"] = round(s.precision, 4)
            rows[name]["recall"] = round(s.recall, 4)
            rows[name]["quads"] = {
                "tp": s.quads_tp, "fp": s.quads_fp, "fn": s.quads_fn,
            }
        for i, d in s.disagreements:
            print(f"DISAGREE {name}/{i}: {d}", file=sys.stderr)
    print(json.dumps({
        "manifests": rows,
        "overall_pass_rate": round(total_agree / total_tests, 4),
        "tests_total": total_tests,
    }, indent=2))


if __name__ == "__main__":
    main()
