"""Distributed BPE tokenizer training (byte-pair encoding merge learning).

A training-data engine that counts tokens, packs sequences, and plans
mixtures should also be able to LEARN the tokenizer those stages assume —
the reference has nothing of the kind (its pipeline stops at Mongo inserts;
SURVEY.md §2.11 scopes the LLM-pipeline family), so this is an engine
addition implementing the public BPE algorithm (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units").

Scale shape — the insight that makes BPE distributable is that after the
initial word count, NOTHING is corpus-sized:

* **word count** — the only corpus-scale stage: one hash aggregate
  (lower/extract words, ``groupBy(word).count``) whose partials collapse
  map-side; the result is the VOCABULARY (≤ tens of millions of rows at
  100 TB — Heaps' law, not corpus size);
* **merge rounds** — each round is one pair-count aggregate over the vocab
  table (adjacent symbol pairs weighted by word frequency; integer sums, so
  partials collapse map-side and the result is partitioning-independent)
  plus a 1-row argmax collect. The corpus is never touched again;
* **merge application** — a literal (non-regex) ``replace`` on the word's
  separator-joined symbol string: both Spark and DuckDB scan left-to-right
  and continue after each replacement, so greedy non-overlapping BPE
  semantics (`` a a a `` + merge (a,a) → `` aa a ``) are bit-identical
  cross-engine — which is what lets a SQL oracle replay every round
  exactly (the k-means unrolled-CTE treatment applied to tokenizer
  training).

Determinism: pair counts are bigint sums of bigint word frequencies
(order-independent under partial aggregation); the winning pair each round
is the lexicographic max of (pair_count DESC, left ASC, right ASC) — a
total order, so ties cannot flip cross-engine.

Representation: a word's symbol sequence is a single string
``" t h e </w> "`` — symbols separated (and flanked) by single spaces,
``</w>`` marking end-of-word (Sennrich's marker). Pre-tokenization is
``[a-z]+`` over the lowercased text (documented restriction: symbols can
then never contain a space, so the literal-replace merge `` l r `` →
`` lr `` matches exactly one symbol boundary and nothing else).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.materialize import materialize

#: End-of-word marker appended to every word's symbol sequence.
EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over ``[a-z]+`` runs of the lowercased text — the one
    corpus-scale aggregate; everything downstream is vocabulary-sized."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_vocab(words: DataFrame) -> DataFrame:
    """(word, freq, seq) with ``seq`` the space-flanked character symbols +
    ``</w>``: ``"the"`` → ``" t h e </w> "``."""
    return words.select(
        "word", "freq",
        F.concat(F.lit(" "),
                 F.regexp_replace(F.col("word"), "(.)", "$1 "),
                 F.lit(EOW + " ")).alias("seq"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count): adjacent symbol pairs weighted by
    word frequency. One hash aggregate; bigint sums collapse map-side."""
    pairs = vocab.select(
        "freq",
        F.explode(F.expr(
            "zip_with(slice(split(trim(seq), ' '), 1,"
            "               size(split(trim(seq), ' ')) - 1),"
            "         slice(split(trim(seq), ' '), 2,"
            "               size(split(trim(seq), ' ')) - 1),"
            "         (a, b) -> struct(a AS l, b AS r))")).alias("p"))
    return (
        pairs.groupBy(F.col("p.l").alias("left_sym"),
                      F.col("p.r").alias("right_sym"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _bpe_train_fullagg(docs: DataFrame, n_merges: int = 8,
                       text_col: str = "text") -> tuple[list[tuple], DataFrame]:
    """Reference trainer: re-aggregates the WHOLE vocab's pair counts every
    round. Exact but per-round cost is O(total symbols in vocab) — kept as
    the differential-test twin for the incremental trainer below."""
    vocab = initial_vocab(word_frequencies(docs, text_col)) \
        .transform(materialize)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("left_sym"),
                     F.asc("right_sym"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_count"]
        merges.append((rank, l, r, l + r, cnt))
        vocab = vocab.withColumn(
            "seq",
            F.replace(F.col("seq"), F.lit(f" {l} {r} "), F.lit(f" {l}{r} ")))
    return merges, vocab


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text", checkpoint_every: int = 50,
              stats: list | None = None) -> tuple[list[tuple], DataFrame]:
    """Learn ``n_merges`` BPE merges over ``docs``. Returns
    ``(merges, final_vocab)`` where ``merges`` is
    ``[(merge_rank, left_sym, right_sym, merged, pair_count)]`` (driver-side,
    n_merges rows — the same bounded-collect class as trained k-means
    centroids) and ``final_vocab`` the (word, freq, seq) table after all
    merges.

    Pair counts are maintained INCREMENTALLY (Sennrich's own optimization):
    after merging (l, r), only words whose seq contains `` l r `` can change
    any pair count, so each round subtracts the affected words' old adjacent
    pairs and adds their new ones — a delta aggregate over the touched words
    only, not a re-aggregation of the whole vocab. At a real tokenizer run
    (30k+ merges) the touched set shrinks rapidly with merge rank while the
    full pair table stays vocabulary-sized; per-round shuffle work tracks
    the delta, which is what keeps 30k rounds feasible. All arithmetic is
    bigint sums of the same word frequencies, so the maintained counts are
    BIT-IDENTICAL to full re-aggregation (differential-tested against
    ``_bpe_train_fullagg``; the SQL oracle replays full re-agg per round and
    still hash-matches).

    Per round: one map-only vocab filter (the touched-word scan), one
    delta-sized aggregate merged into the eagerly-checkpointed pair table,
    and a 1-row argmax collect. The vocab's ``replace`` lineage is truncated
    by a checkpoint every ``checkpoint_every`` rounds (a 30k-round chain of
    string replaces would otherwise blow the plan). If ``stats`` is given,
    ``(round, touched_pairs, total_pairs)`` is appended per round.

    The initial vocab is materialized BEFORE the loop: every round
    evaluates it twice (the touched-word filter feeds two pair-count
    branches), so an unmaterialized vocab re-runs the corpus
    scan+tokenize+frequency aggregate ~2·n_merges times — the same
    re-evaluation defect the round-7 HITS fix killed (measured here:
    sf1 bpe_train 35 s → 7 s). The vocab table is vocabulary-sized
    (distinct words), so the materialization is cheap at any corpus
    scale."""
    vocab = initial_vocab(word_frequencies(docs, text_col)) \
        .transform(materialize)
    pc = _pair_counts(vocab).transform(materialize)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            pc.orderBy(F.desc("pair_count"), F.asc("left_sym"),
                       F.asc("right_sym"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] <= 0:
            break
        l, r, cnt = top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_count"]
        merges.append((rank, l, r, l + r, cnt))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        affected = vocab.where(F.contains(F.col("seq"), F.lit(pat)))
        merged_aff = affected.withColumn(
            "seq", F.replace(F.col("seq"), F.lit(pat), F.lit(rep)))
        delta = (
            _pair_counts(affected)
            .withColumn("pair_count", -F.col("pair_count"))
            .unionAll(_pair_counts(merged_aff))
        )
        if stats is not None:
            touched = delta.select("left_sym", "right_sym").distinct().count()
            stats.append((rank, touched, pc.count()))
        pc = (
            pc.unionAll(delta)
            .groupBy("left_sym", "right_sym")
            .agg(F.sum("pair_count").alias("pair_count"))
            .where(F.col("pair_count") > 0)
            .transform(materialize)
        )
        vocab = vocab.withColumn(
            "seq", F.replace(F.col("seq"), F.lit(pat), F.lit(rep)))
        if rank % checkpoint_every == 0:
            vocab = vocab.transform(materialize)
    return merges, vocab


def bpe_merge_table(docs: DataFrame, n_merges: int = 8,
                    text_col: str = "text") -> DataFrame:
    """The learned merge list as a DataFrame (n_merges local rows):
    (merge_rank, left_sym, right_sym, merged, pair_count)."""
    merges, _ = bpe_train(docs, n_merges, text_col)
    return docs.sparkSession.createDataFrame(
        merges,
        "merge_rank INT, left_sym STRING, right_sym STRING, "
        "merged STRING, pair_count BIGINT")


def bpe_token_counts(docs: DataFrame, n_merges: int = 8,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Encode step: per-document token count under the learned merges —
    (doc_id, bpe_tokens). The final vocab carries each word's token count
    (symbols in its merged ``seq``); documents join word-occurrence counts
    to that vocabulary-sized table (shuffle keyed on word; at 100 TB the
    vocab side is still orders of magnitude smaller than the corpus, and a
    hot word like "the" is ONE row on the vocab side — no skew blowup)."""
    _, vocab = bpe_train(docs, n_merges, text_col)
    per_word = vocab.select(
        "word",
        (F.size(F.split(F.trim(F.col("seq")), " "))).alias("n_tokens"))
    doc_words = (
        docs.select(
            F.col(id_col),
            F.explode(F.expr(
                f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"
            )).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return (
        doc_words.join(per_word, on="word")
        .groupBy(id_col)
        .agg(F.sum(F.col("n_occ") * F.col("n_tokens")).alias("bpe_tokens"))
    )
