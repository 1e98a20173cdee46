"""Spec error model.

The W3C conformance suite asserts on the spec error *code* (e.g. ``invalid
value object``) — mirrored by the reference's JsonLdError
(/root/reference/lib/pyld/jsonld.py:6250-6268). In the Spark pipeline these
never surface as executor exceptions: stage wrappers catch them into
quarantine rows ``(doc_id, stage, error_code, detail)``.
"""

from __future__ import annotations


class JsonLdError(Exception):
    def __init__(self, message: str, code: str, details: dict | None = None):
        super().__init__(f"{code}: {message}")
        self.message = message
        self.code = code
        self.details = details or {}
