"""Spark N-Quads source/sink roundtrip, cross-checked with the pure parser."""

from __future__ import annotations

from pyld_spark.sources.nquads_io import read_nquads, write_nquads

NQ = """\
<http://e/a> <http://e/p> "plain" .
<http://e/a> <http://e/p> "typed"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://e/a> <http://e/p> "tagged"@en-GB .
<http://e/a> <http://e/p> "esc \\"q\\" \\\\ \\t \\n done" .
_:b0 <http://e/q> <http://e/b> <http://e/graph1> .
_:b0 <http://e/q> _:b1 _:gn .
<http://e/a> <http://e/p> "plain" .
# comment line

this is garbage
"""


def test_read_nquads(spark, tmp_path):
    p = str(tmp_path / "in.nq")
    with open(p, "w") as f:
        f.write(NQ)
    df = read_nquads(spark, p).cache()
    good = df.filter("error_code is null")
    bad = df.filter("error_code is not null")
    assert bad.count() == 1
    rows = good.collect()
    assert len(rows) == 6  # duplicate "plain" line deduped
    by_obj = {r.obj_value: r for r in rows if r.obj_kind == "literal"}
    assert by_obj["typed"].obj_datatype.endswith("integer")
    assert by_obj["tagged"].obj_language == "en-GB"
    assert 'esc "q" \\ \t \n done' in by_obj
    graphs = {r.graph for r in rows}
    assert graphs == {"@default", "http://e/graph1", "_:gn"}


def test_roundtrip_matches_pure_parser(spark, tmp_path):
    from pyld_spark.jsonld.nquads import parse_nquads, serialize_quads

    p_in = str(tmp_path / "in2.nq")
    clean = "\n".join(
        ln for ln in NQ.split("\n") if ln and not ln.startswith(("#", "this"))
    ) + "\n"
    with open(p_in, "w") as f:
        f.write(clean)
    df = read_nquads(spark, p_in).filter("error_code is null").drop("error_code")
    out_dir = str(tmp_path / "out_nq")
    write_nquads(df, out_dir, sort_globally=True)
    import glob

    written = "".join(
        open(f).read() for f in sorted(glob.glob(out_dir + "/part-*"))
    )
    expected = serialize_quads(parse_nquads(clean))
    assert written.strip().split("\n") == expected.strip().split("\n")
