"""N-Quads as a Spark source/sink (SURVEY.md §2.1).

Reader: ``spark.read.text`` + one regex → flat triples columns, fully
JVM-side (``regexp_extract`` over the same grammar as the reference's parser,
/root/reference/lib/pyld/nquads.py:28-136). Malformed lines become quarantine
rows rather than exceptions. Dedup per graph = ``dropDuplicates``.

Writer: pure-projection serialization (concat + escape chain) →
``df.write.text``. The global sort exists only for small conformance outputs;
at scale use ``sorted_within_partitions=True`` which sorts per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

_IRI = r"<([^:]+:[^>]*)>"
# same grammar as the driver-side parser (pyld_spark.jsonld.nquads._BNODE):
# a bnode label cannot end with '.'
_BNODE = r"(_:(?:[A-Za-z0-9]+(?:[A-Za-z0-9.\-_]*[A-Za-z0-9\-_])?))"
# same strict STRING_LITERAL_QUOTE body as the driver-side parser
# (pyld_spark.jsonld.nquads._PLAIN): unknown escapes fail the match and the
# line becomes a quarantine row
_LIT = r'"((?:[^"\\]|\\[tbnrf"\'\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*)"'
_WS = r"[ \t]+"
_WSO = r"[ \t]*"

QUAD_PATTERN = (
    rf"^{_WSO}(?:{_IRI}|{_BNODE}){_WS}{_IRI}{_WS}"
    rf"(?:{_IRI}|{_BNODE}|{_LIT}(?:\^\^<([^:]+:[^>]*)>|@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*))?)"
    rf"(?:{_WS}(?:{_IRI}|{_BNODE}))?{_WSO}\.{_WSO}$"
)

#: a genuine \uXXXX/\UXXXXXXXX escape = '\u' preceded by an EVEN number of
#: backslashes ('\\u0007' is an escaped backslash + literal "u0007")
_UNI_ESCAPE = r"(?:\A|[^\\])(?:\\\\)*\\[uU]"


def _unescape(col):
    """JVM-side unescape, identical to nquads.unescape for any literal with
    no unicode escape (those route through :func:`_unescape_unicode`):
    escaped backslashes FIRST (to a sentinel) so '\\\\t' (literal backslash
    + t) is not misread as a tab escape; named escapes next. Unknown
    escapes cannot reach here — the strict _LIT grammar already rejected
    those lines into quarantine."""
    out = F.replace(col, F.lit("\\\\"), F.lit("\x00ESC\x00"))
    for esc, raw in (("\\t", "\t"), ("\\n", "\n"), ("\\r", "\r"), ('\\"', '"'),
                     ("\\b", "\b"), ("\\f", "\f"), ("\\'", "'")):
        out = F.replace(out, F.lit(esc), F.lit(raw))
    out = F.regexp_replace(out, r"\\(.)", r"$1")
    return F.replace(out, F.lit("\x00ESC\x00"), F.lit("\\"))


def _unescape_unicode(col):
    """Arrow-batched fallback for the rare literal containing \\uXXXX — runs
    the exact driver-side ``nquads.unescape`` so both paths share one
    grammar. Only rows matching ``_UNI_ESCAPE`` ever reach this."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def run(s):
        from pyld_spark.jsonld.nquads import unescape

        return s.map(lambda v: unescape(v) if v is not None else None)

    return run(col)


def _escape(col):
    out = col
    for raw, esc in (("\\", "\\\\"), ("\t", "\\t"), ("\n", "\\n"),
                     ("\r", "\\r"), ('"', '\\"')):
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def read_nquads(spark: SparkSession, path: str, dedup: bool = True) -> DataFrame:
    """N-Quads file(s) → triples DataFrame (+ ``error_code`` quarantine
    column for malformed lines)."""
    lines = spark.read.text(path)
    g = [F.regexp_extract("value", QUAD_PATTERN, i) for i in range(0, 11)]
    s_iri, s_bn, p_iri = g[1], g[2], g[3]
    o_iri, o_bn, o_lit, o_dt, o_lang = g[4], g[5], g[6], g[7], g[8]
    g_iri, g_bn = g[9], g[10]
    is_blank = F.col("value").rlike(r"^[ \t]*(#.*)?$")
    matches = F.col("value").rlike(QUAD_PATTERN)
    parsed = (
        lines.filter(~is_blank)
        .withColumn("_ok", matches)
        .select(
            F.when(F.col("_ok") & (s_iri != ""), s_iri)
            .when(F.col("_ok"), s_bn).alias("subj"),
            F.when(F.col("_ok"), p_iri).alias("pred"),
            F.when(~F.col("_ok"), F.lit(None))
            .when(o_iri != "", F.lit("IRI"))
            .when(o_bn != "", F.lit("blank node"))
            .otherwise(F.lit("literal"))
            .alias("obj_kind"),
            F.when(
                F.col("_ok") & (o_iri == "") & (o_bn == ""), o_lit
            ).alias("_raw_lit"),
            F.when(~F.col("_ok"), F.lit(None))
            .when(o_iri != "", o_iri)
            .when(o_bn != "", o_bn)
            .otherwise(F.lit(None))
            .alias("obj_value"),
            F.when(~F.col("_ok") | (o_iri != "") | (o_bn != ""), F.lit(None))
            .when(o_lang != "", F.lit(RDF_LANGSTRING))
            .when(o_dt != "", o_dt)
            .otherwise(F.lit(XSD_STRING))
            .alias("obj_datatype"),
            F.when(F.col("_ok") & (o_lang != ""), o_lang).alias("obj_language"),
            F.when(~F.col("_ok"), F.lit(None))
            .when(g_iri != "", g_iri)
            .when(g_bn != "", g_bn)
            .otherwise(F.lit("@default"))
            .alias("graph"),
            F.when(~F.col("_ok"), F.lit("invalid N-Quads line")).alias("error_code"),
        )
    )
    # literal unescaping: the JVM expression chain covers everything except
    # \uXXXX/\UXXXXXXXX; the (rare) rows containing a genuine unicode escape
    # take the Arrow UDF path so both paths decode the exact same grammar.
    # Split-filter + union keeps the Python worker out of the common case
    # (a `when` would force the UDF to evaluate on every row).
    needs_py = (
        (F.col("obj_kind") == "literal")
        & F.col("_raw_lit").isNotNull()
        & F.col("_raw_lit").rlike(_UNI_ESCAPE)
    )
    fast = parsed.filter(~F.coalesce(needs_py, F.lit(False))).withColumn(
        "obj_value", F.coalesce(F.col("obj_value"), _unescape(F.col("_raw_lit")))
    )
    slow = parsed.filter(F.coalesce(needs_py, F.lit(False))).withColumn(
        "obj_value", _unescape_unicode(F.col("_raw_lit"))
    )
    parsed = fast.unionByName(slow).drop("_raw_lit")
    if dedup:
        good = parsed.filter(F.col("error_code").isNull()).dropDuplicates(
            ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
             "obj_language", "graph"]
        )
        return good.unionByName(parsed.filter(F.col("error_code").isNotNull()))
    return parsed


def nquad_line(df: DataFrame) -> DataFrame:
    """Triples DataFrame → single ``value`` column of N-Quads lines
    (pure projection; whole-stage codegen)."""
    subj = F.when(F.col("subj").startswith("_:"), F.col("subj")).otherwise(
        F.concat(F.lit("<"), F.col("subj"), F.lit(">"))
    )
    pred = F.concat(F.lit("<"), F.col("pred"), F.lit(">"))
    lit_suffix = (
        F.when(F.col("obj_datatype") == RDF_LANGSTRING,
               F.concat(F.lit("@"), F.coalesce(F.col("obj_language"), F.lit(""))))
        .when(
            F.col("obj_datatype").isNotNull() & (F.col("obj_datatype") != XSD_STRING),
            F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")),
        )
        .otherwise(F.lit(""))
    )
    obj = (
        F.when(F.col("obj_kind") == "IRI",
               F.concat(F.lit("<"), F.col("obj_value"), F.lit(">")))
        .when(F.col("obj_kind") == "blank node", F.col("obj_value"))
        .otherwise(
            F.concat(F.lit('"'), _escape(F.col("obj_value")), F.lit('"'), lit_suffix)
        )
    )
    graph = (
        F.when(F.col("graph").isNull() | (F.col("graph") == "@default"), F.lit(""))
        .when(F.col("graph").startswith("_:"), F.concat(F.lit(" "), F.col("graph")))
        .otherwise(F.concat(F.lit(" <"), F.col("graph"), F.lit(">")))
    )
    return df.select(
        F.concat(subj, F.lit(" "), pred, F.lit(" "), obj, graph, F.lit(" .")).alias("value")
    )


def write_nquads(df: DataFrame, path: str, sort_globally: bool = False) -> None:
    """Triples → N-Quads files. ``sort_globally`` only for conformance-sized
    outputs (it is a total order over the corpus); the default sorts within
    partitions (deterministic files without a global shuffle)."""
    lines = nquad_line(df)
    if sort_globally:
        lines = lines.orderBy("value")
    else:
        lines = lines.sortWithinPartitions("value")
    lines.write.mode("overwrite").text(path)
