"""Order-insensitive result digest shared by the verification harnesses.

Canonicalization must be identical everywhere a hash is compared
(verify_local oracle sweep, multi-executor equivalence sweep, scale
comparisons): columns sorted by name, each value rendered with the same
float/NULL/bytes rules, rows sorted, sha256 over the lines.
"""

from __future__ import annotations

import hashlib
import math


def canon_value(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: trim float noise
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()
