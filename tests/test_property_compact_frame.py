"""Property-based differential tests for compaction round-trips and
flattening: expand(doc) then compact with the same context must match the
reference; flatten must match the reference."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.ref_oracle import get_reference_jsonld
from tests.test_expand_vs_reference import equal_unordered
from tests.test_property_differential import CONTEXT, documents


@settings(
    max_examples=100, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)
@given(documents)
def test_compact_roundtrip_matches_reference(doc):
    from pyld_spark.jsonld import api
    from pyld_spark.jsonld.errors import JsonLdError

    ref = get_reference_jsonld()
    ref_out, ref_err = None, False
    try:
        ref_out = ref.compact(doc, {"@context": CONTEXT})
    except Exception:  # noqa: BLE001
        ref_err = True
    my_out, my_err = None, False
    try:
        my_out = api.compact(doc, CONTEXT)
    except JsonLdError:
        my_err = True
    assert my_err == ref_err
    if not ref_err:
        assert equal_unordered(my_out, ref_out), (
            f"\nmine={my_out!r}\nref ={ref_out!r}"
        )


@settings(
    max_examples=100, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)
@given(documents)
def test_flatten_matches_reference(doc):
    from pyld_spark.jsonld import api
    from pyld_spark.jsonld.errors import JsonLdError

    ref = get_reference_jsonld()
    ref_out, ref_err = None, False
    try:
        ref_out = ref.flatten(doc)
    except Exception:  # noqa: BLE001
        ref_err = True
    my_out, my_err = None, False
    try:
        my_out = api.flatten(doc)
    except JsonLdError:
        my_err = True
    assert my_err == ref_err
    if not ref_err:
        assert equal_unordered(my_out, ref_out), (
            f"\nmine={my_out!r}\nref ={ref_out!r}"
        )
