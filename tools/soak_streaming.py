"""Escalated soak for the streaming-shape axis.

The stateful-assembly fuzz (tests/test_streaming_recovery_fuzz.py::
test_random_shapes_stream_vs_batch) cannot run through tools/soak_fuzz.py's
PLAN runner because it needs the pytest ``spark`` + ``tmp_path_factory``
fixtures; this wrapper overrides its stored hypothesis settings and runs it
under pytest. Each example builds a full availableNow streaming query
(~10-20 s), so counts are small compared to the document axes.

Usage: python tools/soak_streaming.py [n_examples]   # default 40
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, settings  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import tests.test_streaming_recovery_fuzz as m

    fn = m.test_random_shapes_stream_vs_batch
    fn._hypothesis_internal_use_settings = settings(
        max_examples=n, deadline=None, database=None,
        suppress_health_check=list(HealthCheck),
    )
    import pytest

    raise SystemExit(pytest.main([
        "-q", "-x",
        "tests/test_streaming_recovery_fuzz.py::"
        "test_random_shapes_stream_vs_batch",
    ]))


if __name__ == "__main__":
    main()
