"""Property-based tests (hypothesis) for the parse/hash kernels.

These target the pure-Python functions inside the ingest UDF, so thousands of
examples run without Spark job overhead. The structural guarantee under test
mirrors §1.4.8: *no input bytes may escape the quarantine contract*.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hierarchical_graph_db_spark.sources.maildir import (
    _content_hash,
    _parse_batches,
    _parse_one,
    _smart_decode,
    _to_utc,
)

REQUIRED_KEYS = {
    "dedupe_key", "message_id", "date", "from", "to", "cc", "bcc",
    "subject", "body", "attachments", "headers",
}


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_parse_one_total_on_arbitrary_bytes(raw):
    """RFC822 parse is total: arbitrary bytes produce a well-formed record
    (the stdlib parser treats garbage as a headerless body)."""
    rec = _parse_one(raw)
    assert REQUIRED_KEYS <= set(rec)
    assert isinstance(rec["to"], list) and isinstance(rec["headers"], dict)
    assert rec["dedupe_key"]  # never empty: msg-id or hash_ prefix


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_smart_decode_total(raw):
    assert isinstance(_smart_decode(raw), str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=64))
def test_date_parse_never_raises(s):
    d = _to_utc(s)
    assert d is None or d.tzinfo is not None


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=5000), st.text(max_size=50))
def test_content_hash_ignores_body_past_2000(body, subject):
    """The 2000-char body preview cap is load-bearing (ingest_enron.py:119):
    bytes past it must not change the key."""
    base = {"from": "a@x", "to": ["b@x"], "date": None, "subject": subject}
    k1 = _content_hash({**base, "body": body[:2000]})
    k2 = _content_hash({**base, "body": (body + "XSUFFIX")[:2000]})
    if len(body) >= 2000:
        assert k1 == k2
    assert k1.startswith("hash_") and len(k1) == 69


def test_quarantine_batch_never_raises():
    """A row whose parse raises becomes an error row; batch length preserved."""
    bad = pd.DataFrame({
        "content": [b"Subject: ok\n\nfine", None],   # None → TypeError inside
        "user": ["u", "u"], "folder": ["f", "f"], "filename": ["1", "2"],
    })
    out = list(_parse_batches(iter([bad])))[0]
    assert len(out) == 2
    assert out["error"].iloc[0] is None
    assert out["error"].iloc[1] is not None