"""Pure-Python JSON-LD 1.1 algorithm family, written from the W3C specs
(JSON-LD 1.1 API, RDF Dataset Canonicalization) for use inside Spark's
Arrow-batched pandas UDFs.

These functions are deliberately side-effect free and picklable: the Spark
stages in ``pyld_spark.operators`` ship them to executors and run them per
document batch. Parity target: the reference processor at /root/reference
(behavioral oracle in tests/ref_oracle.py) — same expansion output, same
toRDF triples, same URDNA2015 canonical labels.
"""

from pyld_spark.jsonld.errors import JsonLdError  # noqa: F401
