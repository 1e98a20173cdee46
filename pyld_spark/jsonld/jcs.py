"""RFC 8785 (JCS) canonical JSON serialization, for ``rdf:JSON`` literals.

Reference parity: /root/reference/lib/c14n/Canonicalize.py (behavioral).
Keys sort by UTF-16 code units; numbers use ECMAScript Number::toString.
"""

from __future__ import annotations

import math


def _es6_number(x: float) -> str:
    """ECMA-262 7.1.12.1 Number::toString(x, 10) for finite doubles."""
    if x != x or math.isinf(x):
        raise ValueError("NaN/Infinity not allowed in JSON")
    if x == 0:
        return "0"
    sign = "-" if x < 0 else ""
    x = abs(x)
    # shortest round-trip decimal representation
    r = repr(x)
    if "e" in r or "E" in r:
        mant, _, exp = r.partition("e")
        exp = int(exp)
    else:
        mant, exp = r, 0
    if "." in mant:
        int_part, frac = mant.split(".")
        alldigits = int_part + frac
        stripped = alldigits.lstrip("0")
        lead_zeros = len(alldigits) - len(stripped)
        n = len(int_part) - lead_zeros + exp
        digits = stripped.rstrip("0") or "0"
    else:
        stripped = mant.lstrip("0")
        n = len(stripped) + exp
        digits = stripped.rstrip("0") or "0"
    k = len(digits)
    if k <= n <= 21:
        s = digits + "0" * (n - k)
    elif 0 < n <= 21:
        s = digits[:n] + "." + digits[n:]
    elif -6 < n <= 0:
        s = "0." + "0" * (-n) + digits
    else:
        e = n - 1
        es = ("e+" if e >= 0 else "e-") + str(abs(e))
        s = digits[0] + ("." + digits[1:] if k > 1 else "") + es
    return sign + s


def _escape(s: str) -> str:
    out = []
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\b":
            out.append("\\b")
        elif ch == "\f":
            out.append("\\f")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def canonicalize(value) -> str:
    """Serialize ``value`` to its RFC 8785 canonical JSON string."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, str):
        return '"' + _escape(value) + '"'
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return _es6_number(value)
    if isinstance(value, list):
        return "[" + ",".join(canonicalize(v) for v in value) + "]"
    if isinstance(value, dict):
        keys = sorted(value, key=_utf16_key)  # sort by UTF-16 code units
        return "{" + ",".join('"' + _escape(k) + '":' + canonicalize(value[k]) for k in keys) + "}"
    raise TypeError(f"not JSON-serializable: {type(value)}")


def _utf16_key(s: str):
    return [u for ch in s for u in _utf16_units(ch)]


def _utf16_units(ch: str):
    cp = ord(ch)
    if cp < 0x10000:
        return (cp,)
    cp -= 0x10000
    return (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF))
