"""Unit tests for distributed BPE training (operators/bpe.py): merge
selection order, greedy non-overlapping merge application (the `` a a a ``
case that must match DuckDB's literal replace), and encode consistency.
Oracle parity is covered by the registry queries (bpe_train_merges,
bpe_encode_token_counts); these pin the SEMANTICS on crafted fixtures."""

from __future__ import annotations

from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.bpe import (
    bpe_token_counts,
    bpe_train,
    initial_vocab,
    word_frequencies,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_word_frequencies_lowercase_alpha_only(spark):
    docs = _docs(spark, ["The cat, the CAT! 42 cats"])
    got = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert got == {"the": 2, "cat": 2, "cats": 1}


def test_initial_seq_shape(spark):
    docs = _docs(spark, ["the"])
    [row] = initial_vocab(word_frequencies(docs)).collect()
    assert row["seq"] == " t h e </w> "


def test_first_merge_is_most_frequent_pair(spark):
    # "ab" ×3 → pair (a, b) count 3 dominates; second merge then glues the
    # new "ab" symbol to </w> (count 3) ahead of anything from "cd".
    docs = _docs(spark, ["ab ab ab cd"])
    merges, vocab = bpe_train(docs, n_merges=2)
    assert merges[0][1:] == ("a", "b", "ab", 3)
    assert merges[1][1:] == ("ab", "</w>", "ab</w>", 3)
    seqs = {r["word"]: r["seq"] for r in vocab.collect()}
    assert seqs["ab"] == " ab</w> "
    assert seqs["cd"] == " c d </w> "


def test_tie_breaks_lexicographic(spark):
    # pairs (a,</w>) and (b,</w>) etc. all count 1; with every pair tied the
    # lexicographically smallest (left, right) must win deterministically.
    docs = _docs(spark, ["xy za"])
    merges, _ = bpe_train(docs, n_merges=1)
    # candidate pairs: (x,y) (y,</w>) (z,a) (a,</w>) — all count 1.
    assert merges[0][1:3] == ("a", "</w>")


def test_greedy_nonoverlapping_repeat_merge(spark):
    # "aaa" → " a a a </w> "; merging (a,a) left-to-right non-overlapping
    # must give " aa a </w> ", exactly like DuckDB's literal replace.
    docs = _docs(spark, ["aa aa aaa"])
    merges, vocab = bpe_train(docs, n_merges=1)
    assert merges[0][1:3] == ("a", "a")
    seqs = {r["word"]: r["seq"] for r in vocab.collect()}
    assert seqs["aaa"] == " aa a </w> "
    assert seqs["aa"] == " aa </w> "


def test_encode_counts_match_final_vocab(spark):
    docs = _docs(spark, ["ab ab cd", "ab"])
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_token_counts(docs, n_merges=2).collect()}
    # merges: (a,b)→ab ×3, then (ab,</w>) ×3. "ab" → 1 token; "cd" →
    # c d </w> = 3 tokens.
    assert got == {0: 1 + 1 + 3, 1: 1}


def test_merge_rounds_stop_when_no_pairs(spark):
    docs = _docs(spark, ["a"])  # " a </w> " → one pair, then none mergeable
    merges, _ = bpe_train(docs, n_merges=5)
    # round 1 merges (a, </w>); later rounds still see zero pairs and stop.
    assert [m[1:3] for m in merges] == [("a", "</w>")]


def test_pair_count_aggregate_is_two_phase(spark):
    """Each merge round's pair count must partial-aggregate map-side (the
    bigint sums commute), and the vocab-side plan must stay join-free —
    the merge-round cost is vocabulary-sized, never corpus-sized."""
    from hierarchical_graph_db_spark.operators.bpe import (
        _pair_counts,
        initial_vocab,
        word_frequencies,
    )
    docs = _docs(spark, ["ab ab ab cd", "cd ab"])
    counts = _pair_counts(initial_vocab(word_frequencies(docs)))
    plan = counts._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_incremental_matches_fullagg_at_n64_and_touches_few_pairs(spark):
    # VERDICT r6 item 3: pair counts must be maintained by DELTAS, bit-equal
    # to full per-round re-aggregation, with per-round touched-pair counts
    # well under the total pair-table size once early merges are done.
    import random

    from hierarchical_graph_db_spark.operators.bpe import _bpe_train_fullagg

    rnd = random.Random(7)
    vocab = ("spark stream batch merge window filter group order value "
             "table column query scan data join hash sort key row fast "
             "slow big small the a part line").split()
    texts = [" ".join(rnd.choices(vocab, weights=range(len(vocab), 0, -1),
                                  k=30)) for _ in range(120)]
    docs = _docs(spark, texts)
    stats: list = []
    merges_inc, vocab_inc = bpe_train(docs, n_merges=64, stats=stats)
    merges_ref, _ = _bpe_train_fullagg(docs, n_merges=64)
    assert merges_inc == merges_ref
    assert len(stats) == len(merges_inc)
    late = [(t, tot) for rank, t, tot in stats if rank > 8]
    assert late, "expected >8 merge rounds on this corpus"
    ratios = [t / tot for t, tot in late]
    assert max(ratios) < 0.5 and sum(ratios) / len(ratios) < 0.25, ratios
