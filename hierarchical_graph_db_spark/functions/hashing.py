"""Content hashing / dedupe-key expressions.

Reference semantics (SURVEY.md §1.4.2): ``dedupe_key = Message-ID, else
"hash_" + sha256(canonical JSON of {from,to,date,subject,body[:2000]})``
(``app/common/utils.py:35-37``, ``app/agents/parsing_agent.py:41-47``).
The 2000-char body cap is load-bearing — it bounds hash cost per row
(``ingest_enron.py:119``).

Exact byte-parity with Python ``json.dumps(sort_keys=True)`` is not a goal
(SURVEY.md §7 "hard parts"): the engine needs *deterministic* keys, so we hash
an explicit ``||``-delimited canonical string instead of JSON. That form is
reproducible in any engine (the DuckDB oracles build the same string).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Cap on the body prefix that feeds the content hash (reference parity).
BODY_HASH_PREVIEW = 2000


def normalized_text(col: Column | str) -> Column:
    """Whitespace-collapsed, lowercased, trimmed text — dedup canonical form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def content_hash(*parts: Column) -> Column:
    """``"hash_" + sha256`` over a canonical delimited concatenation.

    Mirrors ``content_hash`` at ``app/common/utils.py:35-37`` with a
    delimiter-canonical (not JSON-canonical) input string.
    """
    canonical = F.concat_ws("\x1f", *[F.coalesce(p.cast("string"), F.lit("")) for p in parts])
    return F.concat(F.lit("hash_"), F.sha2(canonical, 256))


def dedupe_key(message_id: Column, from_: Column, to: Column, date: Column,
               subject: Column, body: Column) -> Column:
    """``message_id or content_hash(...)`` (``parsing_agent.py:41-47``).

    ``to`` is an array column; it joins with commas (addresses are already
    lowercased/trimmed by the parse stage, ``utils.py:20-22``).
    """
    hash_key = content_hash(
        from_,
        F.array_join(to, ","),
        date.cast("string"),
        subject,
        F.substring(body, 1, BODY_HASH_PREVIEW),
    )
    return F.coalesce(F.nullif(F.trim(message_id), F.lit("")), hash_key)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: sha256 of the normalized text (north-star op)."""
    return F.sha2(normalized_text(text), 256)
