"""Result canonicalization + order-insensitive hashing.

Used by the local parity harness (tools/check.py) and the test suite to
apply the same discipline the driver's t2 comparison uses: columns
sorted by name, floats rounded to 6 digits, timestamps at microsecond
precision, order-insensitive row digest (SURVEY.md §5, §7).
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import Decimal


def canon(v) -> str:
    """Canonicalize one cell so both engines produce identical reprs."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return f"f:{round(v, 6):.6f}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime):
        return "t:" + v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return "d:" + v.isoformat()
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    return "s:" + str(v)


def canon_lines(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    lines = canon_lines(cols, rows)
    return len(rows), hashlib.md5("\n".join(lines).encode()).hexdigest()
