from __future__ import annotations

import json

from pyld_spark.transcripts import (
    assemble_documents,
    synthesize_transcripts,
    transcripts_from_events,
)


def test_synthesize_deterministic(spark):
    a = synthesize_transcripts(spark, n_convs=10, turns_per_conv=5).collect()
    b = synthesize_transcripts(spark, n_convs=10, turns_per_conv=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 10 * 5 + 2 * 2000


def test_transcripts_schema(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir)
    assert [f.name for f in t.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    rows = t.limit(50).collect()
    assert rows
    assert all(r.role in {"user", "assistant", "system", "tool"} for r in rows)


def test_assembly_preserves_turn_order_and_text(spark, sf_dir):
    """Per-row invariant (BASELINE.json input_hint): per-turn text equality
    under stable turn ordering between assembled docs and the source table."""
    t = transcripts_from_events(spark, sf_dir)
    docs = {r.conv_id: r.doc for r in assemble_documents(t).collect()}
    src = t.collect()
    by_conv: dict[str, dict[int, object]] = {}
    for r in src:
        by_conv.setdefault(r.conv_id, {})[r.turn_idx] = r
    assert set(docs) == set(by_conv)
    for conv_id, doc_json in docs.items():
        doc = json.loads(doc_json)
        turns = doc["turns"]["@list"]
        assert [u["turnIndex"] for u in turns] == sorted(by_conv[conv_id])
        for u in turns:
            srow = by_conv[conv_id][u["turnIndex"]]
            assert u["text"] == srow.text
            assert u["role"] == srow.role
            assert u.get("tool") == (srow.tool if srow.tool is not None else None)


def test_assembled_doc_is_valid_jsonld(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir)
    doc_json = assemble_documents(t).limit(1).collect()[0].doc
    doc = json.loads(doc_json)
    assert doc["@type"] == "Conversation"
    assert "@context" in doc and "@id" in doc
