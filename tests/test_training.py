"""Unit tests for the training-data pipeline operators (operators/training.py):
decontamination, sequence packing, stratified sampling, domain mixture,
PII redaction, repetition metrics. Oracle parity is covered by the registry
queries; these pin the operator SEMANTICS on crafted micro-fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.training import (
    decontaminate,
    domain_mixture,
    pack_sequences,
    redact_pii,
    repetition_metrics,
    stratified_sample,
    uniform16,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_flags_shared_ngram(spark):
    bench = _docs(spark, [
        {"doc_id": 100, "text": "alpha beta gamma delta epsilon zeta"},
    ])
    train = _docs(spark, [
        # contains the benchmark 5-gram "alpha beta gamma delta epsilon"
        {"doc_id": 1, "text": "intro alpha beta gamma delta epsilon outro"},
        # shares words but no 5-gram run
        {"doc_id": 2, "text": "alpha beta gamma other delta epsilon zeta"},
        {"doc_id": 3, "text": "totally unrelated content goes right here"},
        {"doc_id": 4, "text": "short doc"},  # < 5 tokens → no shingles
    ])
    got = {r["doc_id"]: r for r in decontaminate(train, bench, n=5).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["contaminated"] and got[1]["n_hit_shingles"] == 1
    for i in (2, 3, 4):
        assert not got[i]["contaminated"] and got[i]["n_hit_shingles"] == 0


def test_decontaminate_counts_distinct_hits(spark):
    bench = _docs(spark, [{"doc_id": 0, "text": "a b c d e f"}])  # 2 5-grams
    train = _docs(spark, [{"doc_id": 1, "text": "a b c d e f"}])
    [row] = decontaminate(train, bench, n=5).collect()
    assert row["n_hit_shingles"] == 2 and row["contaminated"]


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_boundary_math(spark):
    # alpha runs of 4k chars → exactly k estimated tokens each.
    def words(n_tokens):
        return " ".join(["abcd"] * n_tokens)  # each word = 1 token (4 chars)

    docs = _docs(spark, [
        {"doc_id": 1, "source": "s", "text": words(6)},   # [0,6)   pack 0
        {"doc_id": 2, "source": "s", "text": words(3)},   # [6,9)   pack 0, spans
        {"doc_id": 3, "source": "s", "text": words(2)},   # [9,11)  pack 1
        {"doc_id": 4, "source": "t", "text": words(8)},   # [0,8)   pack 0, spans
    ])
    got = {r["doc_id"]: r for r in
           pack_sequences(docs, ctx_tokens=8, order_col="doc_id").collect()}
    assert (got[1]["pack_id"], got[1]["pack_offset"], got[1]["spans_boundary"]) \
        == (0, 0, False)
    assert (got[2]["pack_id"], got[2]["pack_offset"], got[2]["spans_boundary"]) \
        == (0, 6, True)
    assert (got[3]["pack_id"], got[3]["pack_offset"], got[3]["spans_boundary"]) \
        == (1, 1, False)
    # domains pack independently; an exact-fit doc does NOT span
    assert (got[4]["pack_id"], got[4]["pack_offset"], got[4]["spans_boundary"]) \
        == (0, 0, False)


def test_pack_sequences_skips_empty(spark):
    docs = _docs(spark, [
        {"doc_id": 1, "source": "s", "text": "abcd"},
        {"doc_id": 2, "source": "s", "text": "   "},
    ])
    assert [r["doc_id"] for r in pack_sequences(docs, 8).collect()] == [1]


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_deterministic_and_monotone(spark):
    docs = _docs(spark, [
        {"doc_id": i, "lang": "en" if i % 2 == 0 else "zh"} for i in range(200)
    ])
    lo = stratified_sample(docs, {"en": 0.5, "zh": 0.5}).collect()
    lo2 = stratified_sample(docs, {"en": 0.5, "zh": 0.5}).collect()
    assert sorted(map(tuple, lo)) == sorted(map(tuple, lo2))  # reproducible
    hi = stratified_sample(docs, {"en": 0.8, "zh": 0.8}).collect()
    kept_lo = {r["doc_id"] for r in lo if r["keep"]}
    kept_hi = {r["doc_id"] for r in hi if r["keep"]}
    assert kept_lo <= kept_hi  # raising the rate only ADDS docs
    # rate is roughly honored (u16 is uniform; 200 docs → loose bound)
    assert 0.35 <= len(kept_lo) / 200 <= 0.65


def test_stratified_sample_default_rate(spark):
    docs = _docs(spark, [{"doc_id": i, "lang": "xx"} for i in range(100)])
    none_kept = stratified_sample(docs, {"en": 1.0}, default_rate=0.0).collect()
    assert not any(r["keep"] for r in none_kept)
    all_kept = stratified_sample(docs, {"en": 0.0}, default_rate=1.0).collect()
    assert all(r["keep"] for r in all_kept)


def test_uniform16_matches_reference_sha(spark):
    import hashlib

    from pyspark.sql import functions as F

    got = spark.createDataFrame([Row(doc_id=42)]) \
        .select(uniform16(F.col("doc_id"), "samp").alias("u")) \
        .collect()[0]["u"]
    want = int(hashlib.sha256(b"samp|42").hexdigest()[:4], 16)
    assert got == want


# ---------------------------------------------------------------------------
# Domain mixture
# ---------------------------------------------------------------------------


def test_domain_mixture_repeat_factors(spark):
    docs = _docs(spark, [
        # 10 tokens of domain a, 30 of domain b (abcd = 1 token)
        *[{"doc_id": i, "source": "a", "text": "abcd abcd"} for i in range(5)],
        *[{"doc_id": 10 + i, "source": "b", "text": "abcd abcd abcd"}
          for i in range(10)],
    ])
    got = {r["source"]: r for r in
           domain_mixture(docs, {"a": 3.0, "b": 1.0}).collect()}
    assert got["a"]["domain_tokens"] == 10 and got["b"]["domain_tokens"] == 30
    assert got["a"]["natural_share"] == 0.25
    assert got["a"]["target_share"] == 0.75
    # repeat = target/natural: a must be drawn 3×, b at 1/3
    assert got["a"]["repeat_factor"] == pytest.approx(3.0)
    assert got["b"]["repeat_factor"] == pytest.approx(0.3333, abs=1e-4)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_all_types(spark):
    docs = _docs(spark, [{
        "doc_id": 1,
        "text": "mail bob.smith+x@corp.example.org ssn 123-45-6789 "
                "call 415-555-0123 or 415.555.0124 host 192.168.0.1 done",
    }])
    [r] = redact_pii(docs).collect()
    assert r["n_email"] == 1 and r["n_ssn"] == 1
    assert r["n_phone"] == 2 and r["n_ipv4"] == 1
    assert r["redacted"] == (
        "mail <EMAIL> ssn <SSN> call <PHONE> or <PHONE> host <IPV4> done"
    )


def test_redact_pii_no_cross_matching(spark):
    docs = _docs(spark, [
        # a 3-3-4 phone must NOT be eaten by the 3-2-4 SSN pattern
        {"doc_id": 1, "text": "num 415-555-0123 end"},
        # digits inside an e-mail must not count again as phone/ip
        {"doc_id": 2, "text": "a1.2.3.4@ex.com only"},
        {"doc_id": 3, "text": "clean text without identifiers"},
    ])
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[1]["n_ssn"] == 0 and got[1]["n_phone"] == 1
    assert got[2]["n_email"] == 1 and got[2]["n_ipv4"] == 0
    assert got[2]["redacted"] == "<EMAIL> only"
    assert got[3]["redacted"] == "clean text without identifiers"
    assert got[3]["n_email"] == got[3]["n_phone"] == 0


# ---------------------------------------------------------------------------
# Repetition metrics
# ---------------------------------------------------------------------------


def test_repetition_metrics_counts(spark):
    docs = _docs(spark, [
        # tokens a b a b a b a → trigrams: aba bab aba bab aba (5 total, 2 distinct)
        {"doc_id": 1, "text": "a b a b a b a"},
        {"doc_id": 2, "text": "w x y z"},  # 2 trigrams, both unique
        {"doc_id": 3, "text": "one two"},  # < 3 tokens → absent
    ])
    got = {r["doc_id"]: r for r in repetition_metrics(docs, n=3).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_ngrams"] == 5 and got[1]["n_distinct_ngrams"] == 2
    assert got[1]["dup_ngram_ratio"] == 0.6
    assert got[1]["top_ngram_share"] == 0.6
    assert got[2]["dup_ngram_ratio"] == 0.0
    assert got[2]["top_ngram_share"] == 0.5


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_windows_and_tail(spark):
    from hierarchical_graph_db_spark.operators.training import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    docs = _docs(spark, [
        {"doc_id": 1, "text": " ".join(toks)},   # 10 tokens
        {"doc_id": 2, "text": "a b"},            # fits one window
        {"doc_id": 3, "text": "   "},            # blank → absent
    ])
    got = {(r["doc_id"], r["chunk_id"]): r for r in
           chunk_documents(docs, chunk_tokens=4, overlap=2).collect()}
    # stride 2: starts 0,2,4,6 (last start ≤ 10-2-1=7) → 4 chunks
    assert {k for k in got if k[0] == 1} == {(1, 0), (1, 1), (1, 2), (1, 3)}
    assert got[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert got[(1, 1)]["chunk_text"] == "t2 t3 t4 t5"
    assert got[(1, 3)]["chunk_text"] == "t6 t7 t8 t9"
    assert got[(1, 3)]["n_chunk_tokens"] == 4
    assert got[(2, 0)]["chunk_text"] == "a b"
    assert not any(k[0] == 3 for k in got)


def test_chunk_documents_no_fully_contained_tail(spark):
    from hierarchical_graph_db_spark.operators.training import chunk_documents

    # exactly one window's worth of tokens → exactly one chunk (no redundant
    # tail chunk that is a suffix of chunk 0)
    docs = _docs(spark, [{"doc_id": 1, "text": " ".join(["w"] * 4)}])
    rows = chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    assert len(rows) == 1 and rows[0]["n_chunk_tokens"] == 4


def test_pack_sequences_custom_order_col(spark):
    docs = _docs(spark, [
        {"doc_id": 1, "source": "s", "rank": 2, "text": "abcd abcd"},
        {"doc_id": 2, "source": "s", "rank": 1, "text": "abcd abcd abcd"},
    ])
    got = {r["doc_id"]: r for r in
           pack_sequences(docs, ctx_tokens=4, order_col="rank").collect()}
    # rank orders doc 2 first: [0,3) then doc 1 at [3,5) spanning
    assert got[2]["pack_id"] == 0 and not got[2]["spans_boundary"]
    assert got[1]["pack_id"] == 0 and got[1]["spans_boundary"]


# ---------------------------------------------------------------------------
# Model-checked invariants on randomized corpora (one Spark job per property)
# ---------------------------------------------------------------------------


def test_chunking_invariants_random_corpus(spark):
    """Chunking invariants vs a pure-Python model on a seeded random corpus:
    full coverage, consecutive ids, exact window contents."""
    import random

    from hierarchical_graph_db_spark.operators.training import chunk_documents

    rng = random.Random(7)
    corpus = {
        i: [f"w{rng.randrange(50)}" for _ in range(rng.randrange(0, 120))]
        for i in range(60)
    }
    docs = _docs(spark, [
        {"doc_id": i, "text": " ".join(toks)} for i, toks in corpus.items()
    ])
    chunk, overlap, stride = 32, 8, 24
    rows = chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    for i, toks in corpus.items():
        n = len(toks)
        if n == 0:
            assert i not in got
            continue
        starts = list(range(0, max(n - overlap - 1, 0) + 1, stride))
        assert sorted(got[i]) == list(range(len(starts)))
        covered = set()
        for cid, s in enumerate(starts):
            r = got[i][cid]
            window = toks[s:s + chunk]
            assert r["chunk_text"] == " ".join(window)
            assert r["n_chunk_tokens"] == len(window)
            covered.update(range(s, min(s + chunk, n)))
        assert covered == set(range(n))  # no token left behind


def test_packing_invariants_random_corpus(spark):
    """Packing invariants vs the concat-and-chunk model: offsets are the
    running total mod ctx, spans_boundary iff the doc crosses a window edge."""
    import random

    rng = random.Random(11)
    rows_in = [
        {"doc_id": i, "source": f"s{i % 3}",
         "text": " ".join(["abcd"] * rng.randrange(1, 40))}
        for i in range(90)
    ]
    docs = _docs(spark, rows_in)
    ctx = 64
    got = {r["doc_id"]: r for r in pack_sequences(docs, ctx_tokens=ctx).collect()}
    cums = {}
    for row in sorted(rows_in, key=lambda r: r["doc_id"]):
        est = row["text"].count("abcd")  # 1 token per word by construction
        cum = cums.get(row["source"], 0)
        r = got[row["doc_id"]]
        assert r["est_tokens"] == est
        assert r["pack_id"] == cum // ctx
        assert r["pack_offset"] == cum % ctx
        assert r["spans_boundary"] == ((cum % ctx) + est > ctx)
        cums[row["source"]] = cum + est


def test_domain_quota_cap_semantics(spark):
    """Cap respected per domain; draw is deterministic; raising the cap
    only ADDS survivors (prefix property of the sha256 rank order — the
    reproducibility contract shared with stratified_sample)."""
    from hierarchical_graph_db_spark.operators.training import (
        domain_quota_cap,
    )

    rows = [(i, f"d{i % 3}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    small = {(r["doc_id"], r["source"])
             for r in domain_quota_cap(docs, cap=5).collect()}
    again = {(r["doc_id"], r["source"])
             for r in domain_quota_cap(docs, cap=5).collect()}
    big = {(r["doc_id"], r["source"])
           for r in domain_quota_cap(docs, cap=9).collect()}
    assert small == again
    assert len(small) == 15 and len(big) == 27
    assert small < big
    from collections import Counter

    per = Counter(s for _, s in big)
    assert all(c == 9 for c in per.values())


def test_span_corruption_roundtrip(spark):
    """Denoising-pair invariant: substituting each <Xk> sentinel in the
    inputs with its span from the targets reconstructs the normalized
    token stream exactly, and masked fraction is near the configured
    rate."""
    import re

    from hierarchical_graph_db_spark.operators.training import span_corrupt

    rows = [(i, " ".join(f"w{(i * 31 + j * 7) % 97}" for j in range(40)))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["inputs"], r["targets"])
           for r in span_corrupt(docs, rate=0.2).collect()}
    masked_total = 0
    for doc_id, text in rows:
        inputs, targets = out[doc_id]
        spans = {}
        chunks = re.split(r"<X(\d+)> ?", targets)
        for idx in range(1, len(chunks), 2):
            spans[int(chunks[idx])] = chunks[idx + 1].strip()
        rebuilt = re.sub(r"<X(\d+)>",
                         lambda m: spans[int(m.group(1))], inputs)
        rebuilt = re.sub(r"\s+", " ", rebuilt).strip()
        assert rebuilt == text.lower().strip(), doc_id
        masked_total += sum(len(s.split()) for s in spans.values())
    frac = masked_total / (30 * 40)
    assert 0.1 < frac < 0.3  # salted draw concentrates near rate=0.2
