"""Tokenizer-training queries: distributed BPE merge learning + encoding.

The oracle replays EVERY merge round in SQL (the k-means unrolled-CTE
treatment): round r's CTE chain computes pair counts from the
round-(r-1) vocabulary, picks the argmax pair under the same
(count DESC, left, right) total order, and applies the merge with the same
literal ``replace`` — both engines scan left-to-right and continue after a
replacement, so greedy non-overlap semantics agree bit-for-bit (verified:
`` a a a `` + (a,a) → `` aa a `` in both). The oracle string is GENERATED
from the same ``BPE_MERGES`` constant the Spark operator uses, so the round
count cannot drift.

Every round CTE is ``MATERIALIZED``: round r references v{r-1} TWICE (pair
counts + merge apply), so left to the inliner the chain expands to 2^n
evaluations of the corpus split — measured 30× slower at sf0.01 and a
68 GB / >45 min blowup at sf1. Materialization makes the oracle the same
linear chain the Spark operator runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.bpe import (
    bpe_merge_table,
    bpe_token_counts,
)
from hierarchical_graph_db_spark.queries import query

#: Merge rounds learned by both the Spark operator and the unrolled oracle.
BPE_MERGES = 8

_WORDS_CTE = """
    words AS MATERIALIZED (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
              FROM documents) t
        GROUP BY w
    ),
    v0 AS MATERIALIZED (
        SELECT word, freq,
               ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> '
               AS seq
        FROM words
    )
"""


def _round_ctes(r: int) -> str:
    """CTE block for merge round ``r``: pair counts over v{r-1}, the argmax
    merge m{r}, and the merged vocabulary v{r}."""
    return f"""
    p{r} AS MATERIALIZED (
        SELECT q.p.l AS left_sym, q.p.r AS right_sym,
               CAST(sum(q.freq) AS BIGINT) AS pair_count
        FROM (
            SELECT freq,
                   unnest(list_transform(range(1, len(syms)),
                                         i -> {{'l': syms[i],
                                                'r': syms[i + 1]}})) AS p
            FROM (SELECT freq, string_split(trim(seq), ' ') AS syms
                  FROM v{r - 1}) s
        ) q
        GROUP BY q.p.l, q.p.r
    ),
    m{r} AS MATERIALIZED (
        SELECT {r} AS merge_rank, left_sym, right_sym,
               left_sym || right_sym AS merged, pair_count
        FROM p{r}
        ORDER BY pair_count DESC, left_sym, right_sym
        LIMIT 1
    ),
    v{r} AS MATERIALIZED (
        SELECT word, freq,
               replace(seq, ' ' || m.left_sym || ' ' || m.right_sym || ' ',
                       ' ' || m.merged || ' ') AS seq
        FROM v{r - 1}, m{r} m
    )"""


def _train_chain(n: int) -> str:
    return _WORDS_CTE + "," + ",".join(_round_ctes(r) for r in range(1, n + 1))


_MERGES_SQL = (
    "WITH " + _train_chain(BPE_MERGES) + "\n    "
    + " UNION ALL ".join(f"SELECT * FROM m{r}"
                         for r in range(1, BPE_MERGES + 1))
)

_ENCODE_SQL = (
    "WITH " + _train_chain(BPE_MERGES) + f""",
    per_word AS (
        SELECT word,
               CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_tokens
        FROM v{BPE_MERGES}
    ),
    doc_words AS (
        SELECT doc_id, w AS word, CAST(count(*) AS BIGINT) AS n_occ
        FROM (SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
              FROM documents) t
        GROUP BY doc_id, w
    )
    SELECT doc_id, CAST(sum(n_occ * n_tokens) AS BIGINT) AS bpe_tokens
    FROM doc_words JOIN per_word USING (word)
    GROUP BY doc_id
"""
)


@query("bpe_train_merges", _MERGES_SQL)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {n} BPE merges over ``documents`` (Sennrich et al.
    2016, public method): (merge_rank, left_sym, right_sym, merged,
    pair_count). After the single corpus-scale word count, every round
    touches only the vocabulary table — see ``operators/bpe.py`` for the
    100 TB shape."""
    return bpe_merge_table(Catalog(spark, sf_dir).documents,
                           n_merges=BPE_MERGES)


@query("bpe_encode_token_counts", _ENCODE_SQL)
def bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count under the learned BPE merges — the encode
    path: documents' word-occurrence counts join the vocabulary-sized
    (word → n_tokens) table; a hot word is ONE vocab row, so no skew
    blowup."""
    return bpe_token_counts(Catalog(spark, sf_dir).documents,
                            n_merges=BPE_MERGES)
