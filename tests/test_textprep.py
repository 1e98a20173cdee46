"""PII scrubbing and sliding-window chunking (operators/textprep.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_scrub_all_types(spark):
    from pyld_spark.operators.textprep import pii_scrub

    df = _docs(spark, [
        (1, "mail me at alice.smith+x@ex-corp.co.uk or bob@ex.io thanks"),
        (2, "call 415-555-0101 or 212-555-9999"),
        (3, "ssn 123-45-6789 card 4111-1111-1111-1234 ip 10.0.0.1"),
        (4, "nothing sensitive here"),
    ])
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert out[1].n_email == 2 and out[1].n_pii == 2
    assert "[EMAIL]" in out[1].scrubbed_text and "@" not in out[1].scrubbed_text
    assert out[2].n_phone == 2
    assert out[2].scrubbed_text == "call [PHONE] or [PHONE]"
    assert out[3].n_ssn == 1 and out[3].n_card == 1 and out[3].n_ip == 1
    assert out[3].scrubbed_text == "ssn [SSN] card [CARD] ip [IP]"
    assert out[4].n_pii == 0 and out[4].scrubbed_text == "nothing sensitive here"


def test_pii_scrub_sequential_no_double_count(spark):
    from pyld_spark.operators.textprep import pii_scrub

    # the card pass consumes its digits, so the later SSN/phone/IP passes
    # must count 0 on the residue; an SSN is not also a phone number
    df = _docs(spark, [(1, "4111-1111-1111-1234"), (2, "123-45-6789")])
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert out[1].n_card == 1 and out[1].n_ssn == 0 and out[1].n_phone == 0
    assert out[1].n_pii == 1
    assert out[2].n_ssn == 1 and out[2].n_phone == 0


def test_chunk_documents_windows(spark):
    from pyld_spark.operators.textprep import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = _docs(spark, [(1, words), (2, "solo"), (3, "   "), (4, "")])
    out = chunk_documents(df, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 10 tokens, size 4, stride 3 -> ceil((10-4)/3)+1 = 3 windows at 0,3,6
    chunks = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in chunks] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert [r.n_chunk_tokens for r in chunks] == [4, 4, 4]
    # short doc -> one short window; empty/whitespace docs -> no rows
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "solo"
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_documents_covers_every_token(spark):
    from pyld_spark.operators.textprep import chunk_documents

    # boundary case: n - chunk_size divisible by stride (no dangling window)
    words = " ".join(f"t{i}" for i in range(13))  # 13 = 4 + 3*3
    df = _docs(spark, [(1, words)])
    chunks = sorted(chunk_documents(df, chunk_size=4, stride=3).collect(),
                    key=lambda r: r.chunk_idx)
    assert len(chunks) == 4
    assert chunks[-1].chunk_text == "t9 t10 t11 t12"
    covered = set()
    for r in chunks:
        covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(13)}


def test_chunk_plan_has_no_shuffle(spark):
    from pyld_spark.operators.textprep import chunk_documents

    df = _docs(spark, [(1, "a b c")])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_textprep_gate_queries_match_oracle(spark, sf_dir):
    """The two gate queries hash-match their DuckDB oracles at sf0.001
    (same replica protocol as tools/check_oracle.py)."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    for name in ("pii_scrub", "doc_chunks"):
        sdf = entry.queries()[name](spark, sf_dir)
        spark_rows = sorted(
            tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()
        )
        odf = con.execute(entry.oracle_sql()[name]).df()
        oracle_rows = sorted(
            tuple(row[c] for c in sorted(odf.columns))
            for _, row in odf.iterrows()
        )
        assert sorted(sdf.columns) == sorted(odf.columns.tolist()), name
        assert spark_rows == oracle_rows, name


def test_word_ngrams_expr(spark):
    from pyld_spark.operators.textprep import word_ngrams_expr

    df = spark.createDataFrame(
        [("a", "The quick  brown fox"), ("b", "tiny"), ("c", "")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["g"] for r in
           df.select("doc_id", word_ngrams_expr("text", 3).alias("g")).collect()}
    assert got["a"] == ["the quick brown", "quick brown fox"]
    assert got["b"] == [] and got["c"] == []


def test_ngram_decontaminate(spark):
    from pyld_spark.operators.textprep import ngram_decontaminate

    train = spark.createDataFrame(
        [
            ("t1", "alpha beta gamma delta"),       # shares 'alpha beta gamma'
            ("t2", "completely different words here"),
            ("t3", "x"),                            # no 3-grams at all
            ("t4", "ALPHA BETA GAMMA"),             # case-insensitive hit
        ],
        "doc_id string, text string",
    )
    test = spark.createDataFrame(
        [("e1", "prefix alpha beta gamma suffix")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
           for r in ngram_decontaminate(train, test, n=3).collect()}
    assert got == {
        "t1": (2, 1, True),
        "t2": (2, 0, False),
        "t3": (0, 0, False),
        "t4": (1, 1, True),
    }


def test_pack_sequences_single_shard_semantics(spark):
    from pyld_spark.operators.textprep import pack_sequences

    # token counts: "aa bb" -> 2, "c d e" -> 3, "ff" -> 1, "g h" -> 2
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "c d e"), (3, "ff"), (4, "g h")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["pack_id"], r["pack_offset"])
           for r in pack_sequences(docs, seq_len=4, shards=1).collect()}
    # stream: doc1@0..1, doc2@2..4 (starts in pack 0), doc3@5, doc4@6..7
    assert got == {
        1: (2, 0, 0),
        2: (3, 0, 2),
        3: (1, 1, 1),
        4: (2, 1, 2),
    }


def test_pack_sequences_append_stable_and_partition_invariant(spark):
    from pyld_spark.operators.textprep import pack_sequences

    full = spark.createDataFrame(
        [(i, f"tok{i} " * (i % 7 + 1)) for i in range(200)],
        "doc_id long, text string",
    )
    a = pack_sequences(full.repartition(11), seq_len=16).collect()
    b = pack_sequences(full.repartition(2), seq_len=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # appending higher-id docs never re-packs earlier ones (per shard)
    prefix = pack_sequences(full.where("doc_id < 100"), seq_len=16).collect()
    full_map = {r["doc_id"]: tuple(r) for r in a}
    assert all(full_map[r["doc_id"]] == tuple(r) for r in prefix)
