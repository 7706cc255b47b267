"""End-to-end training-corpus curation — the flagship of the LLM-pipeline
surface: fuzzy dedup (pairs → clusters → keep/drop) ∘ quality filtering ∘
token budgeting, summarized per language.

Every stage is individually oracle-checked elsewhere
(``fuzzy_dedup_resolution``, ``quality_filter_decisions``,
``token_count_bpeish``); this query proves they COMPOSE — the whole curation
decision for every document in one plan, the way a production pipeline runs
it (one pass over documents + the dedup pair machinery, no intermediate
materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.functions.text import llm_token_estimate, quality_metrics
from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query
from hierarchical_graph_db_spark.queries.dedup import _NORM, fuzzy_cc_labels
from hierarchical_graph_db_spark.queries.textq import _SQL_HITS, _SQL_PIECES, _SQL_TOKENS

_DUP_SQL = f"""
    WITH RECURSIVE toks AS (
        SELECT id, u.s.tok AS tok, u.s.pos AS pos
        FROM (
            SELECT doc_id AS id,
                   unnest(list_transform(string_split_regex({_NORM}, '\\s+'),
                                         (x, i) -> {{'tok': x, 'pos': i - 1}})) AS s
            FROM documents
        ) u
    ),
    sh AS MATERIALIZED (
        SELECT DISTINCT t0.id, t0.tok || ' ' || t1.tok || ' ' || t2.tok AS shingle
        FROM toks t0
        JOIN toks t1 ON t1.id = t0.id AND t1.pos = t0.pos + 1
        JOIN toks t2 ON t2.id = t0.id AND t2.pos = t0.pos + 2
    ),
    shf AS MATERIALIZED (
        -- hot-shingle guard, mirroring ngram_jaccard_pairs' "auto" cutoff
        SELECT sh.id, sh.shingle
        FROM sh
        JOIN (SELECT shingle, count(*) AS df FROM sh GROUP BY 1) f
          USING (shingle)
        WHERE f.df <= greatest(1000,
                               floor((SELECT count(*) FROM documents) / 100))
    ),
    sizes AS (SELECT id, count(*) AS n FROM shf GROUP BY id),
    pairs AS MATERIALIZED (
        SELECT id_a, id_b FROM (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
            FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2
        ) c
        JOIN sizes sa ON sa.id = c.id_a
        JOIN sizes sb ON sb.id = c.id_b
        WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
    ),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
    ),
    comp AS (SELECT node AS id, min(r) AS keep_id FROM reach GROUP BY node)
"""

_QUALITY_OK = (
    "length(trim(text)) > 0"
    f" AND len({_SQL_TOKENS}) BETWEEN 8 AND 100000"
    " AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) >= 0.6"
    f" AND {_SQL_HITS} / len({_SQL_TOKENS}) >= 0.01"
)

_EST_TOKENS = (
    f"list_sum(list_transform({_SQL_PIECES}, "
    "p -> CASE WHEN regexp_matches(p, '^[A-Za-z]+$') "
    "THEN CAST(ceil(length(p) / 4.0) AS BIGINT) ELSE 1 END))"
)


@query(
    "corpus_curation_summary",
    f"""
    {_DUP_SQL},
    decided AS (
        SELECT d.lang,
               coalesce(comp.keep_id, d.doc_id) <> d.doc_id AS is_dup,
               {_QUALITY_OK}                                AS quality_ok,
               coalesce({_EST_TOKENS}, 0)                   AS est_tokens
        FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                               AS n_docs,
           CAST(sum(CASE WHEN NOT is_dup AND quality_ok
                         THEN 1 ELSE 0 END) AS BIGINT)            AS n_kept,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                                                                  AS n_dropped_dup,
           CAST(sum(CASE WHEN NOT is_dup AND NOT quality_ok
                         THEN 1 ELSE 0 END) AS BIGINT)            AS n_dropped_quality,
           CAST(sum(CASE WHEN NOT is_dup AND quality_ok
                         THEN est_tokens ELSE 0 END) AS BIGINT)   AS est_tokens_kept
    FROM decided
    GROUP BY lang
    """,
)
def corpus_curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language curation summary: which documents survive fuzzy dedup
    (cluster keeper) AND the quality gates, and how many estimated LLM
    tokens the kept set holds. Cluster labels come from the shared cached
    stage (``queries.dedup.fuzzy_cc_labels`` — built once per
    (run, sf_dir), reused by the resolution/golden-record queries)."""
    docs = Catalog(spark, sf_dir).documents
    cc = fuzzy_cc_labels(spark, sf_dir, threshold=0.5)

    m = quality_metrics(F.col("text"))
    quality_ok = (
        (F.length(F.trim("text")) > 0)
        & (m["n_tokens"] >= 8) & (m["n_tokens"] <= 100000)
        & (m["alpha_ratio"] >= 0.6)
        & (m["stopword_ratio"] >= 0.01)
    )
    decided = (
        docs.join(cc, on="doc_id", how="left")
        .select(
            "lang",
            (F.coalesce("keep_id", F.col("doc_id")) != F.col("doc_id"))
            .alias("is_dup"),
            quality_ok.alias("quality_ok"),
            llm_token_estimate(F.col("text")).alias("est_tokens"),
        )
    )
    kept = ~F.col("is_dup") & F.col("quality_ok")
    return decided.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dropped_dup"),
        F.sum((~F.col("is_dup") & ~F.col("quality_ok")).cast("long"))
        .alias("n_dropped_quality"),
        F.sum(F.when(kept, F.col("est_tokens")).otherwise(0)).alias("est_tokens_kept"),
    )
