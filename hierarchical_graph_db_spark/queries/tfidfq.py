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
