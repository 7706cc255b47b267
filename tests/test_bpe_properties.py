"""Property-based test: the incremental distributed BPE trainer vs a
pure-Python Sennrich reference (round-14 extension of the differential
layer).

The existing unit tests pin hand-picked merge/tie/overlap cases and the
incremental-vs-fullagg identity; this drives the whole trainer on random
corpora over a 2-letter alphabet — the regime where tie-breaks, repeated
runs (``aaaa`` → greedy non-overlapping merges), and pairs whose counts
drop to zero mid-training are all constant — and compares BOTH the merge
table (rank, pair, merged symbol, count) and every word's final symbol
sequence against an independent sequential implementation. The model
replicates the two pinned semantics choices: the argmax total order
(pair_count DESC, left ASC, right ASC) and left-to-right non-overlapping
literal replacement (Python ``str.replace`` — same contract as Spark's
``F.replace``, which is what makes the SQL oracle replay exact).
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="ab", min_size=1, max_size=4)
_texts = st.lists(
    st.lists(_word, min_size=1, max_size=3).map(" ".join),
    min_size=1, max_size=4,
)

_N_MERGES = 5


def _model(texts, n_merges):
    freq = Counter()
    for t in texts:
        freq.update(re.findall("[a-z]+", t.lower()))
    vocab = {w: " " + " ".join(list(w) + ["</w>"]) + " " for w in freq}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, seq in vocab.items():
            syms = seq.split()
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += freq[w]
        if not pc:
            break
        (l, r), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((rank, l, r, l + r, cnt))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        vocab = {w: s.replace(pat, rep) for w, s in vocab.items()}
    return merges, vocab


@settings(max_examples=6, deadline=None, derandomize=True)
@given(texts=_texts)
def test_bpe_train_matches_sequential_reference(spark, texts):
    from hierarchical_graph_db_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    merges, vocab = bpe_train(docs, n_merges=_N_MERGES)
    got_vocab = {r["word"]: r["seq"] for r in vocab.collect()}

    want_merges, want_vocab = _model(texts, _N_MERGES)
    assert merges == want_merges
    assert got_vocab == want_vocab
