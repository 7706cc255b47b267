"""TF-IDF scoring over ``documents`` (SURVEY.md M5 text-analysis family) and
the skew-resistant top-k variant of the ranking stage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.functions.text import tokens
from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.skew import salted_topk
from hierarchical_graph_db_spark.queries import query

# Term frequencies / document frequencies built relationally:
# explode(tokens) → per-(doc, term) counts → join per-term doc frequency.
# idf = ln((N+1)/(df+1)) (smoothed); score = tf · idf, rounded before ranking
# so rank order is platform-stable; ties break on the term string.

_SQL_TERMS = """
terms AS (
    SELECT doc_id, t.term AS term, CAST(count(*) AS BIGINT) AS tf
    FROM documents,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(term)
    WHERE length(trim(text)) > 0
    GROUP BY doc_id, t.term
),
df AS (
    SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM terms GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents WHERE length(trim(text)) > 0),
scored AS (
    SELECT doc_id, term,
           round(tf * ln((n_docs + 1.0) / (doc_freq + 1.0)), 6) AS tfidf
    FROM terms CROSS JOIN n JOIN df USING (term)
)
"""


@query(
    "text_tfidf_topk",
    f"""
    WITH {_SQL_TERMS}
    SELECT doc_id, term, tfidf, rnk FROM (
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — tokenize, per-doc TF, corpus DF,
    smoothed idf, windowed rank. All Catalyst; one explode, two aggs, one
    broadcast join (term DF table is vocabulary-sized)."""
    docs = Catalog(spark, sf_dir).documents.where(F.length(F.trim("text")) > 0)
    terms = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = docs.count()
    scored = terms.join(F.broadcast(doc_freq), on="term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("doc_freq") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


# BM25 (Robertson-Spärck Jones, public formula; k1=1.2, b=0.75): the ranked
# retrieval step over the same tokenization as the inverted index / TF-IDF.
# The "query" is self-contained: the 3 highest-df corpus terms (deterministic
# tie-break on the term string), so the fixture needs no hardcoded vocabulary.
# Per-doc scores sum the ≤3 matched term weights in FIXED POINT (round to
# 1e-6 → bigint → sum → one division) so partial-aggregation order can never
# flip the 5dp-rounded hash.

# CTE chain ending in s(doc_id, score) — shared verbatim by the BM25 oracle
# here and the hybrid-RRF oracle in similarityq.py so both engines replay
# the exact same lexical scoring.
_SQL_BM25_SCORES = """terms AS (
        SELECT doc_id, t.term AS term, CAST(count(*) AS BIGINT) AS tf
        FROM documents,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(term)
        WHERE length(trim(text)) > 0
        GROUP BY doc_id, t.term
    ),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS doc_freq
        FROM terms GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs
          FROM documents WHERE length(trim(text)) > 0),
    dl AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM terms GROUP BY doc_id
    ),
    ad AS (SELECT CAST(sum(dl) AS BIGINT) * 1.0 / count(*) AS avgdl FROM dl),
    qt AS (
        SELECT term, doc_freq FROM df ORDER BY doc_freq DESC, term LIMIT 3
    ),
    w AS (
        SELECT t.doc_id,
               CAST(round(
                   ln(1.0 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
                   * ((t.tf * 2.2)
                      / (t.tf + 1.2 * (0.25 + 0.75 * (dl.dl / avgdl))))
                   * 1000000) AS BIGINT) AS fp
        FROM terms t
        JOIN qt USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN n CROSS JOIN ad
    ),
    s AS (
        SELECT doc_id,
               round(CAST(sum(fp) AS BIGINT) / 1000000.0, 5) AS score
        FROM w GROUP BY doc_id
    )"""

_SQL_BM25 = f"""
    WITH {_SQL_BM25_SCORES}
    SELECT doc_id, score, rnk FROM (
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS rnk
        FROM s
    ) WHERE rnk <= 10
"""


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 scores (doc_id, score) for the corpus's 3
    highest-df terms — the scoring stage shared by :func:`text_bm25_topk`
    (which ranks it) and ``hybrid_retrieval_rrf`` in ``similarityq.py``
    (which fuses it with a semantic ranking). Identical arithmetic either
    way, so the DuckDB CTE replay covers both callers."""
    docs = Catalog(spark, sf_dir).documents.where(F.length(F.trim("text")) > 0)
    # The (doc_id, term, tf) table feeds THREE plan subtrees (df→qt, dl,
    # and the matched-postings scoring join); without materialization the
    # tokenize+explode+agg recomputes once per subtree — the measured four
    # ~0.35 s single-task broadcast-stage jobs in hybrid_retrieval_rrf's
    # profile (round 15; same justification as ngram_jaccard_pairs' shared
    # shingle table).
    from hierarchical_graph_db_spark.materialize import materialize

    terms = (
        docs.select("doc_id",
                    F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    ).transform(materialize)
    doc_freq = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"))
    dl = terms.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_and_avg = dl.agg(
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    qt = doc_freq.orderBy(F.col("doc_freq").desc(), F.col("term")).limit(3)

    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
        / (F.col("doc_freq") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(1.2) * (F.lit(0.25)
                             + F.lit(0.75) * (F.col("dl") / F.col("avgdl"))))
    w = (
        terms.join(F.broadcast(qt), on="term")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(n_and_avg))
        .select("doc_id",
                F.round(idf * ((F.col("tf") * F.lit(2.2)) / denom)
                        * F.lit(1000000)).cast("bigint").alias("fp"))
    )
    return w.groupBy("doc_id").agg(
        F.round(F.sum("fp") / F.lit(1000000.0), 5).alias("score"))


@query("text_bm25_topk", _SQL_BM25)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for the corpus's 3 highest-df terms — the
    ranked-retrieval stage over the inverted-index family (same
    tokenization as ``inverted_index_postings``/``text_tfidf_topk``).
    Plan shape: one explode + two hash aggs build tf/df/dl; the 3-term
    query table and the 1-row (N, avgdl) aggregates broadcast; scoring is
    a per-(doc, matched-term) projection followed by one fixed-point
    hash agg per doc — no shuffle grows with vocabulary size, and the
    corpus-side work is linear in matched postings (the inverted-list
    contract at 100 TB, where qt comes from the user, not df)."""
    s = bm25_scores(spark, sf_dir)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        s.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= 10)
        .select("doc_id", "score", "rnk")
    )


@query(
    "window_topk_salted",
    """
    SELECT user_id, event_id, rank FROM (
        SELECT user_id, event_id,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY value DESC, event_id) AS BIGINT)
                   AS rank
        FROM events
    ) WHERE rank <= 3
    """,
)
def window_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per user via the two-stage salted window
    (``operators/skew.py``) — identical output to the direct window, but no
    reducer ever sorts more than |key|/n_salts rows. The oracle is the plain
    single-window SQL, proving the equivalence."""
    ev = Catalog(spark, sf_dir).events
    out = salted_topk(
        ev.select("user_id", "event_id", "value"),
        keys=["user_id"],
        order_by=[F.col("value").desc(), F.col("event_id").asc()],
        k=3,
    )
    return out.select("user_id", "event_id", F.col("rank").cast("long").alias("rank"))
