"""The documents-only fixture generator (round 9) is scaling-evidence
infrastructure — HEAPS_r9.json's decade claims are only reproducible if
the generator stays deterministic and its two vocabulary regimes keep
their contracts (Heaps growth with a Zipf head vs the fixed 31-word
adversarial vocab). Pin both, plus the dup-injection rates the dedup
queries rely on for non-trivial pair sets."""

from __future__ import annotations

import json
import os
import sys
import tempfile

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))


def _gen(sf, mode):
    from gen_fixtures import generate_documents_only

    d = tempfile.mkdtemp(prefix=f"docsfix_{mode}_")
    generate_documents_only(sf, d, mode=mode)
    t = pq.read_table(os.path.join(d, "documents.parquet"))
    with open(os.path.join(d, "MANIFEST.json")) as f:
        m = json.load(f)
    return t, m


def test_deterministic_across_calls():
    a, _ = _gen(0.02, "heaps")
    b, _ = _gen(0.02, "heaps")
    assert a.equals(b)  # byte-equal columns: same seed -> same corpus


def test_heaps_vocab_grows_and_fixed_does_not():
    _, h1 = _gen(0.02, "heaps")
    _, h4 = _gen(0.08, "heaps")
    # V = 3*sqrt(T): 4x the tokens -> ~2x the vocab (within rounding slack)
    assert 1.7 < h4["vocab"] / h1["vocab"] < 2.3
    _, f1 = _gen(0.02, "fixed")
    _, f4 = _gen(0.08, "fixed")
    assert f1["vocab"] == f4["vocab"] == 31


def test_zipf_head_not_uniform():
    """The Heaps mode must keep a Zipfian head — a uniform draw over the
    growing vocab would fake away the hot-shingle df growth the round-9
    measurement exists to include (PLANS.md §Round-9)."""
    t, m = _gen(0.05, "heaps")
    from collections import Counter

    c = Counter(w for s in t.column("text").to_pylist() for w in s.split())
    top = c.most_common(2)
    total = sum(c.values())
    # Zipf rank^-1 over V words: p(rank1)=1/H(V) (a few percent), and
    # p(rank1)/p(rank2) ~ 2. Uniform would put rank1 at ~1/V (~0.01%).
    assert top[0][1] / total > 50 / m["vocab"]
    assert 1.5 < top[0][1] / top[1][1] < 2.6


def test_dup_injection_present():
    t, _ = _gen(0.05, "fixed")
    texts = t.column("text").to_pylist()
    assert len(texts) - len(set(texts)) >= len(texts) // 1000  # exact dups
