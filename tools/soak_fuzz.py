"""Escalated differential-fuzz soak (round-4: verdict items 1 & 8).

Runs chosen hypothesis axes at much higher example counts than the per-test
defaults by overriding each test's stored settings (the pytest-side settings
stay small so CI stays fast). Usage::

    python tools/soak_fuzz.py                 # default plan (~200k examples)
    python tools/soak_fuzz.py framing=50000   # override one axis

Never run concurrently with a benchmark.
"""

from __future__ import annotations

import sys
import time

from hypothesis import HealthCheck, settings

# axis name -> (module, test function name, default soak examples).
# Framing and compaction round-trips are the weakest axes per the round-3
# verdict — they get the bulk of the budget.
PLAN = {
    "framing": ("tests.test_property_contexts",
                "test_random_context_framing_matches_reference", 60000),
    "compaction": ("tests.test_property_contexts",
                   "test_random_context_compaction_matches_reference", 60000),
    "link": ("tests.test_property_contexts",
             "test_random_context_link_matches_reference", 20000),
    "frameopts": ("tests.test_property_contexts",
                  "test_random_context_framing_options_matches_reference",
                  15000),
    "compactopts": ("tests.test_property_contexts",
                    "test_random_context_compaction_options_matches_reference",
                    15000),
    "expansion": ("tests.test_property_contexts",
                  "test_random_context_expansion_matches_reference", 20000),
    "expansion10": ("tests.test_property_contexts",
                    "test_random_context_expansion_matches_reference_mode_10", 10000),
    "tordf": ("tests.test_property_contexts",
              "test_random_context_tordf_matches_reference", 15000),
    "flatten": ("tests.test_property_contexts",
                "test_random_context_flatten_matches_reference", 10000),
    "normalize": ("tests.test_property_contexts",
                  "test_random_context_normalize_matches_reference", 10000),
    "remote": ("tests.test_property_contexts",
               "test_remote_context_loader_matches_reference", 10000),
    "expandctx": ("tests.test_property_contexts",
                  "test_random_expand_context_option_matches_reference", 10000),
    "apiopts": ("tests.test_property_contexts",
                "test_random_api_base_options_matches_reference", 15000),
    "mode10ops": ("tests.test_property_contexts",
                  "test_random_context_mode10_ops_matches_reference", 15000),
    "html": ("tests.test_property_html_ingest",
             "test_extraction_recovers_planted_scripts", 5000),
    "fromrdf": ("tests.test_property_fromrdf",
                "test_random_quads_fromrdf_matches_reference", 20000),
    "fromrdf_rt": ("tests.test_property_fromrdf",
                   "test_random_quads_roundtrip_through_tordf", 10000),
    "c14n_quads": ("tests.test_property_fromrdf",
                   "test_random_quads_normalize_matches_reference", 10000),
    "c14n_bnode": ("tests.test_property_fromrdf",
                   "test_random_bnode_graph_normalize_matches_reference", 8000),
    "rdfopts": ("tests.test_property_differential",
                "test_rdf_option_axes_match_reference", 8000),
    "pipe_diff": ("tests.test_property_differential",
                  "test_expand_tordf_normalize_match_reference", 8000),
    "fromrdf_rt2": ("tests.test_property_differential",
                    "test_fromrdf_roundtrip_matches_reference", 6000),
    "nquads": ("tests.test_property_nquads",
               "test_parse_nquads_matches_reference", 10000),
    "nquads_bad": ("tests.test_property_nquads",
                   "test_malformed_lines_rejected_like_reference", 10000),
    "relativize": ("tests.test_property_nquads",
                   "test_relativize_matches_reference_unresolve", 10000),
    "jcs": ("tests.test_property_jcs", "test_jcs_matches_reference", 10000),
    # Spark-operator axes (pure-Python replays, no reference): the as-of
    # forward-tie bug hid below the 25-example pytest default — soak these
    "asof": ("tests.test_property_temporal",
             "test_asof_join_matches_python_replay", 2000),
    "interval": ("tests.test_property_temporal",
                 "test_interval_join_matches_brute_force", 2000),
    "linkheader": ("tests.test_property_link_header",
                   "test_parse_link_header_matches_reference", 5000),
    # wave N+21: chained decode paths — compaction/framing over
    # fromRdf-SHAPED inputs, and expansion over expanded form
    "quad_compact": ("tests.test_property_quadchains",
                     "test_random_quads_fromrdf_compact_matches_reference",
                     10000),
    "quad_frame": ("tests.test_property_quadchains",
                   "test_random_quads_fromrdf_frame_matches_reference", 8000),
    "expand2": ("tests.test_property_quadchains",
                "test_double_expansion_matches_reference", 10000),
    # wave N+22: document-side operation chains (each engine consumes its
    # own intermediate, so silent intermediate divergences amplify)
    "compact_expand": ("tests.test_property_opchains",
                       "test_compact_then_expand_matches_reference", 10000),
    "flatten_frame": ("tests.test_property_opchains",
                      "test_flatten_then_frame_matches_reference", 8000),
    "frame_compact": ("tests.test_property_opchains",
                      "test_frame_then_compact_matches_reference", 8000),
    # wave N+24/N+25 (round-5 verdict item 2): @import chains x protected
    # terms; 4-stage expand->toRdf->fromRdf->compact chains; f4cafdb-class
    # rich random graphs through BOTH c14n algorithms
    "import_chain": ("tests.test_property_contexts",
                     "test_import_protected_chain_matches_reference", 20000),
    "rdf_roundtrip4": ("tests.test_property_opchains",
                       "test_expand_tordf_fromrdf_compact_matches_reference",
                       20000),
    "c14n_rich": ("tests.test_property_fromrdf",
                  "test_rich_random_graph_normalize_matches_reference", 15000),
}


_SPARK = None


def _spark():
    global _SPARK
    if _SPARK is None:
        from pyld_spark.session import get_spark

        _SPARK = get_spark("soak_fuzz", cpus=8, shuffle_partitions=8)
    return _SPARK


def run_axis(name: str, module: str, fn_name: str, n: int) -> float:
    import importlib
    import inspect

    mod = importlib.import_module(module)
    fn = getattr(mod, fn_name)
    fn._hypothesis_internal_use_settings = settings(
        max_examples=n, deadline=None, database=None,
        suppress_health_check=list(HealthCheck),
    )
    # Spark-operator axes declare the pytest `spark` fixture as their first
    # parameter; @given leaves it as a required positional on the wrapper
    needs_spark = "spark" in inspect.signature(fn).parameters
    t0 = time.time()
    try:
        fn(_spark()) if needs_spark else fn()
    except Exception as e:  # noqa: BLE001 — print sub-notes for shrunk examples
        # prefix EVERY line so a `grep FAIL` pipeline keeps the whole
        # multi-line assertion message and falsifying example
        def _emit(tag: str, text: str) -> None:
            for ln in str(text).splitlines() or [""]:
                print(f"FAIL {name} {tag}| {ln}")

        _emit("exc", f"{type(e).__name__}: {e}")
        for note in getattr(e, "__notes__", []) or []:
            _emit("note", note)
        for sub in getattr(e, "exceptions", []) or []:
            _emit("sub", f"{type(sub).__name__}: {sub}")
            for note in getattr(sub, "__notes__", []) or []:
                _emit("subnote", note)
        raise
    return time.time() - t0


def main() -> None:
    sys.path.insert(0, "/root/repo")
    overrides = dict(a.split("=") for a in sys.argv[1:])
    only = overrides.pop("only", None)
    only_set = set(only.split(",")) if only else None
    total = 0
    for name, (module, fn_name, default_n) in PLAN.items():
        if only_set is not None and name not in only_set:
            continue
        n = int(overrides.get(name, default_n))
        if n <= 0:
            continue
        wall = run_axis(name, module, fn_name, n)
        total += n
        print(f"OK {name}: {n} examples in {wall:.0f}s", flush=True)
    print(f"SOAK CLEAN: {total} examples")


if __name__ == "__main__":
    main()
