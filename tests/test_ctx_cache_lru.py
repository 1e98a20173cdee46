"""Regression: the executor context cache evicts LRU-style, one entry at a
time — never a full wipe (round-3 verdict item 7).

A pipeline cycling through more distinct per-doc contexts than the cap must
keep its hot working set; the old behavior (``_CTX_CACHE.clear()`` at
capacity) recomputed every context each time the 65th arrived.
"""

import pyld_spark.operators.expand_stage as es


def _fill(n, start=0):
    for i in range(start, start + n):
        es._processed_context({"p": f"http://ex.org/p{i}#"}, None)


def setup_function(_fn):
    es._CTX_CACHE.clear()


def test_capacity_is_respected():
    _fill(es._CTX_CACHE_MAX + 10)
    assert len(es._CTX_CACHE) == es._CTX_CACHE_MAX


def test_eviction_is_single_entry_not_full_wipe():
    _fill(es._CTX_CACHE_MAX)
    keys_before = set(es._CTX_CACHE)
    # one more distinct context evicts exactly one entry (the oldest)
    es._processed_context({"p": "http://ex.org/overflow#"}, None)
    keys_after = set(es._CTX_CACHE)
    assert len(keys_after) == es._CTX_CACHE_MAX
    assert len(keys_before - keys_after) == 1, "full-cache wipe regressed"


def test_hit_refreshes_recency():
    _fill(es._CTX_CACHE_MAX)
    oldest_key = next(iter(es._CTX_CACHE))
    # touch the oldest → it becomes most-recent and survives the next evict
    ctx_value = {"p": "http://ex.org/p0#"}
    es._processed_context(ctx_value, None)
    es._processed_context({"p": "http://ex.org/overflow#"}, None)
    assert oldest_key in es._CTX_CACHE


def test_cached_object_identity_on_hit():
    a = es._processed_context({"q": "http://ex.org/q#"}, None)
    b = es._processed_context({"q": "http://ex.org/q#"}, None)
    assert a is b
