"""Text-analysis queries over ``documents`` (north-star ops, SURVEY.md §2.11).

Token counting, quality scoring, heuristic language ID, fingerprinting — the
analysis stage the reference declared (NER/validation agents, README.md:86-87)
but never built, re-expressed as pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.functions.hashing import fingerprint
from hierarchical_graph_db_spark.functions.text import (
    EN_STOPWORDS,
    language_id,
    quality_keep,
    quality_metrics,
    tokens,
)
from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query

_SQL_TOKENS = "string_split_regex(trim(text), '\\s+')"
_SQL_STOPLIST = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"
_SQL_HITS = (
    f"len(list_filter({_SQL_TOKENS}, t -> lower(t) IN {_SQL_STOPLIST}))"
)


@query(
    "text_token_stats",
    f"""
    SELECT lang,
           CAST(count(*) AS BIGINT)                 AS n_docs,
           CAST(sum(len({_SQL_TOKENS})) AS BIGINT)  AS total_tokens,
           round(avg(len({_SQL_TOKENS})), 4)        AS avg_tokens,
           CAST(max(len({_SQL_TOKENS})) AS BIGINT)  AS max_tokens
    FROM documents
    WHERE length(trim(text)) > 0
    GROUP BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting, aggregated per declared language."""
    docs = Catalog(spark, sf_dir).documents.where(F.length(F.trim("text")) > 0)
    n_tok = F.size(tokens(F.col("text")))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
        F.round(F.avg(n_tok), 4).alias("avg_tokens"),
        F.max(n_tok).cast("long").alias("max_tokens"),
    )


@query(
    "text_quality_scores",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)                         AS n_chars,
           CAST(len({_SQL_TOKENS}) AS BIGINT)                   AS n_tokens,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / length(text), 6)                             AS alpha_ratio,
           round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                 / length(text), 6)                             AS punct_ratio,
           round({_SQL_HITS} / len({_SQL_TOKENS}), 6)           AS stopword_ratio,
           round(length(regexp_replace(text, '\\s+', '', 'g'))
                 / len({_SQL_TOKENS}), 6)                       AS mean_token_len
    FROM documents
    WHERE length(trim(text)) > 0
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: length / punctuation / stopword ratios
    (the quality-scoring stage of an LLM data pipeline)."""
    docs = Catalog(spark, sf_dir).documents.where(F.length(F.trim("text")) > 0)
    m = quality_metrics(F.col("text"))
    return docs.select(
        "doc_id",
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        F.round(m["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(m["punct_ratio"], 6).alias("punct_ratio"),
        F.round(m["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(m["mean_token_len"], 6).alias("mean_token_len"),
    )


@query(
    "language_id_heuristic",
    f"""
    SELECT doc_id,
           CASE
             WHEN len({_SQL_TOKENS}) = 0 THEN 'und'
             WHEN {_SQL_HITS} / len({_SQL_TOKENS}) >= 0.05 THEN 'en'
             ELSE 'other'
           END AS lang_pred
    FROM documents
    """,
)
def language_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language ID (n-gram-heuristic family). The scorer is
    swappable (fastText in a pandas UDF at production); the operator contract
    text → lang code is what's exercised here."""
    return Catalog(spark, sf_dir).documents.select(
        "doc_id", language_id(tokens(F.col("text"))).alias("lang_pred")
    )


@query(
    "doc_fingerprints",
    "SELECT doc_id, sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp "
    "FROM documents",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-document fingerprint over normalized text (the
    content-hash family P8 applied to documents)."""
    return Catalog(spark, sf_dir).documents.select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


_SQL_PIECES = "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')"


@query(
    "token_count_bpeish",
    f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKENS}) AS BIGINT)  AS whitespace_tokens,
           CAST(len({_SQL_PIECES}) AS BIGINT)  AS bpe_pieces,
           CAST(list_sum(list_transform({_SQL_PIECES},
                p -> CASE WHEN regexp_matches(p, '^[A-Za-z]+$')
                          THEN CAST(ceil(length(p) / 4.0) AS BIGINT)
                          ELSE 1 END)) AS BIGINT) AS est_llm_tokens
    FROM documents
    WHERE length(trim(text)) > 0
    """,
)
def token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways (SURVEY §2.11): whitespace words and the
    BPE-ish piece estimator (GPT-style pre-tokenizer regex + ~4-chars-per-
    token for alpha runs) — the budget-accounting numbers an LLM data
    pipeline tracks per document."""
    from hierarchical_graph_db_spark.functions.text import (
        bpe_ish_tokens,
        llm_token_estimate,
    )

    docs = Catalog(spark, sf_dir).documents.where(F.length(F.trim("text")) > 0)
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("whitespace_tokens"),
        F.size(bpe_ish_tokens(F.col("text"))).cast("long").alias("bpe_pieces"),
        llm_token_estimate(F.col("text")).alias("est_llm_tokens"),
    )


# C4-style keep rules over the quality features; thresholds are part of the
# operator contract (oracle embeds the same ones).
_QF_RULES_SQL = (
    "length(trim(text)) > 0"
    " AND len({toks}) BETWEEN 8 AND 100000"
    " AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) >= 0.6"
    " AND {hits} / len({toks}) >= 0.01"
).format(toks=_SQL_TOKENS, hits=_SQL_HITS)


@query(
    "quality_filter_decisions",
    f"""
    SELECT doc_id,
           {_QF_RULES_SQL} AS keep,
           CASE
             WHEN length(trim(text)) = 0 THEN 'empty'
             WHEN len({_SQL_TOKENS}) < 8 THEN 'too_short'
             WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  / length(text) < 0.6 THEN 'low_alpha'
             WHEN {_SQL_HITS} / len({_SQL_TOKENS}) < 0.01 THEN 'low_stopword'
             ELSE 'ok'
           END AS reason
    FROM documents
    """,
)
def quality_filter_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-FILTER stage (C4-style keep rules over the scored
    features): every document gets (keep, reason) — heuristic gates on
    length, alpha ratio, and stopword density. Scoring without a decision
    step is half an operator; this is the half pipelines act on."""
    docs = Catalog(spark, sf_dir).documents
    m = quality_metrics(F.col("text"))
    n_toks = m["n_tokens"]
    alpha = m["alpha_ratio"]
    stopr = m["stopword_ratio"]
    blank = F.length(F.trim("text")) == 0
    reason = (
        F.when(blank, "empty")
        .when(n_toks < 8, "too_short")
        .when(alpha < 0.6, "low_alpha")
        .when(stopr < 0.01, "low_stopword")
        .otherwise("ok")
    )
    return docs.select(
        "doc_id",
        quality_keep(F.col("text")).alias("keep"),
        reason.alias("reason"),
    )


@query(
    "doc_unigram_logprob",
    f"""
    WITH tok AS (
        SELECT doc_id, lower(unnest({_SQL_TOKENS})) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(CAST(v.c AS DOUBLE) / CAST(tot.n AS DOUBLE))), 5)
               AS avg_logprob
    FROM tok t
    JOIN vocab v ON t.token = v.token
    CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit scoring via a self-trained unigram LM: each document's
    mean token log-probability under the corpus unigram distribution — the
    cheap perplexity proxy real pipelines use to rank text against a
    reference corpus. Vocab counts are one hash aggregate, the corpus total
    is a 1-row broadcast, and the token→vocab join shuffles on the token
    (AQE handles the stopword-skewed keys)."""
    docs = Catalog(spark, sf_dir).documents \
        .where(F.length(F.trim("text")) > 0)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("_raw")
    ).select("doc_id", F.lower("_raw").alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    return (
        tok.join(vocab, "token")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("n").cast("double"))),
                5,
            ).alias("avg_logprob"),
        )
    )


@query(
    "inverted_index_postings",
    f"""
    WITH tok AS (
        SELECT doc_id, lower(unnest({_SQL_TOKENS})) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    tf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY token),
    pairs AS (SELECT DISTINCT token, doc_id FROM tok),
    idx AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
        FROM pairs GROUP BY token
    )
    SELECT idx.token, idx.df, tf.tf, idx.postings
    FROM idx JOIN tf USING (token)
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per token, document frequency, total term
    frequency, and the sorted posting list — the engine-side analog of the
    reference's declared text indexes, materialized as a queryable table.
    Distinct (token, doc) pairs and tf both come off the exploded token
    stream with hash aggregates; postings serialize as a sorted
    comma-joined string (the cross-engine array canonicalization). At
    100 TB the posting list per token is the skew point — hot tokens are
    exactly what the stop-shingle guards elsewhere prune."""
    docs = Catalog(spark, sf_dir).documents \
        .where(F.length(F.trim("text")) > 0)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("_raw")
    ).select("doc_id", F.lower("_raw").alias("token"))
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    idx = (
        tok.distinct()
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_set("doc_id")),
                    lambda d: d.cast("string"),
                ),
            ).alias("postings"),
        )
    )
    return idx.join(tf, "token").select("token", "df", "tf", "postings")


@query(
    "text_pmi_collocations",
    """
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    big AS (
        SELECT q.p.a AS w1, q.p.b AS w2,
               CAST(count(*) AS BIGINT) AS pair_count
        FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> {'a': t[i], 'b': t[i + 1]})) AS p
            FROM toks WHERE len(t) >= 2
        ) q
        GROUP BY q.p.a, q.p.b
    ),
    tot AS (
        SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS n_uni,
               (SELECT CAST(sum(pair_count) AS BIGINT) FROM big) AS n_pairs
    )
    SELECT w1, w2, pair_count, pmi, rnk FROM (
        SELECT w1, w2, pair_count,
               round(ln((pair_count / CAST(n_pairs AS DOUBLE))
                        / ((u1.c / CAST(n_uni AS DOUBLE))
                           * (u2.c / CAST(n_uni AS DOUBLE)))), 5) AS pmi,
               CAST(row_number() OVER (
                   ORDER BY round(ln((pair_count / CAST(n_pairs AS DOUBLE))
                            / ((u1.c / CAST(n_uni AS DOUBLE))
                               * (u2.c / CAST(n_uni AS DOUBLE)))), 5) DESC,
                            w1, w2) AS BIGINT) AS rnk
        FROM big
        JOIN uni u1 ON big.w1 = u1.w
        JOIN uni u2 ON big.w2 = u2.w
        CROSS JOIN tot
        WHERE pair_count >= 5
    ) WHERE rnk <= 25
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 bigram collocations by pointwise mutual information (Church &
    Hanks 1990, public method) — the phrase-mining stage of a corpus
    pipeline (multi-word expressions for tokenizer vocab / stopword-phrase
    lists). Adjacent pairs come from a row-local slice/zip of the token
    array (no positional self-join); unigram and bigram counts are one hash
    aggregate each; the two unigram lookups join on the word key (AQE
    handles stopword skew) with the 1-row totals broadcast; PMI compares
    the bigram's probability against independence. Support floor
    pair_count >= 5 kills the long random tail, rank ties break on the
    words so the hash is stable. The global top-25 window ranks the
    post-aggregation surviving-pairs table, not the corpus."""
    docs = Catalog(spark, sf_dir).documents \
        .where(F.length(F.trim("text")) > 0)
    toks = docs.select(
        F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        toks.where(F.size("t") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(t[i - 1] AS w1, t[i] AS w2))")).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_pairs = big.agg(F.sum("pair_count").alias("n_pairs"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(F.log(
        (F.col("pair_count") / F.col("n_pairs").cast("double"))
        / ((F.col("c1") / F.col("n_uni").cast("double"))
           * (F.col("c2") / F.col("n_uni").cast("double")))), 5)
    from pyspark.sql import Window
    win = Window.orderBy(F.col("pmi").desc(), "w1", "w2")
    return (
        big.where(F.col("pair_count") >= 5)
        .join(u1, "w1").join(u2, "w2")
        .join(F.broadcast(n_uni)).join(F.broadcast(n_pairs))
        .select("w1", "w2", "pair_count", pmi.alias("pmi"))
        .withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= 25)
    )


@query(
    "quality_perplexity_buckets",
    f"""
    WITH tok AS (
        SELECT doc_id, lower(unnest({_SQL_TOKENS})) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT count(*) AS n FROM tok),
    scored AS (
        SELECT t.doc_id,
               round(avg(ln(CAST(v.c AS DOUBLE) / CAST(tot.n AS DOUBLE))), 5)
                   AS avg_logprob
        FROM tok t JOIN vocab v ON t.token = v.token CROSS JOIN tot
        GROUP BY t.doc_id
    ),
    cuts AS (
        SELECT round(quantile_cont(avg_logprob, 1.0/3), 6) AS t_low,
               round(quantile_cont(avg_logprob, 2.0/3), 6) AS t_high
        FROM scored
    )
    SELECT doc_id, avg_logprob,
           CASE WHEN avg_logprob >= t_high THEN 'head'
                WHEN avg_logprob >= t_low  THEN 'middle'
                ELSE 'tail' END AS bucket,
           avg_logprob >= t_low AS keep
    FROM scored CROSS JOIN cuts
    """,
)
def quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019, public
    method): score every document under the corpus-fit unigram LM (the
    ``doc_unigram_logprob`` scorer), split the corpus into head / middle /
    tail at the score tertiles, keep head+middle — the standard LM-driven
    quality filter for web-scale pretraining data. The tertile cuts are a
    1-row aggregate broadcast back over the score table (never the raw
    corpus); scores are 5-dp and the cuts 6-dp, so boundary comparisons
    agree cross-engine. At 100 TB the exact tertiles over the per-doc
    score table would swap for ``sample_quantiles`` on the same salted
    contract — one bounded-state pass, same report schema."""
    docs = Catalog(spark, sf_dir).documents \
        .where(F.length(F.trim("text")) > 0)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("_raw")
    ).select("doc_id", F.lower("_raw").alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tok.join(vocab, "token")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.round(
            F.avg(F.log(F.col("c").cast("double") / F.col("n").cast("double"))),
            5).alias("avg_logprob"))
    )
    cuts = scored.agg(
        F.round(F.expr("percentile(avg_logprob, CAST(1.0/3 AS DOUBLE))"), 6)
        .alias("t_low"),
        F.round(F.expr("percentile(avg_logprob, CAST(2.0/3 AS DOUBLE))"), 6)
        .alias("t_high"),
    )
    return (
        scored.join(F.broadcast(cuts))
        .select(
            "doc_id", "avg_logprob",
            F.when(F.col("avg_logprob") >= F.col("t_high"), "head")
            .when(F.col("avg_logprob") >= F.col("t_low"), "middle")
            .otherwise("tail").alias("bucket"),
            (F.col("avg_logprob") >= F.col("t_low")).alias("keep"),
        )
    )


# --- TextRank keyword extraction ---------------------------------------------


def _textrank_oracle(n_iter: int = 8, damping: float = 0.85,
                     top_k: int = 25) -> str:
    """DuckDB twin of the TextRank pipeline: co-occurrence edge build +
    every iteration unrolled as a MATERIALIZED CTE with the same
    fixed-point bigint contribution sums and 6dp state rounding as
    ``operators.graph.weighted_textrank``. Constants enter via ``repr`` so
    both engines iterate with bit-identical doubles."""
    base, d = repr(1 - damping), repr(damping)
    iters = []
    prev = "s0"
    for i in range(1, n_iter + 1):
        iters.append(f"""
    s{i} AS MATERIALIZED (
        SELECT v.id, round({base} + {d} * coalesce(c.s, 0), 6) AS score
        FROM vertices v
        LEFT JOIN (
            SELECT e.dst AS id,
                   sum(CAST(round(p.score * e.weight / e.outw * 1000000)
                            AS BIGINT)) / 1000000.0 AS s
            FROM ew e JOIN s{i - 1} p ON e.src = p.id
            GROUP BY e.dst
        ) c ON v.id = c.id
    )""")
        prev = f"s{i}"
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
        FROM documents
        WHERE len(string_split_regex(trim(text), '\\s+')) >= 2
    ),
    tok AS (
        SELECT doc_id, unnest(ts) AS w,
               unnest(range(1, len(ts) + 1)) AS pos
        FROM toks
    ),
    pr AS (
        SELECT a.w AS x, b.w AS y
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.w <> b.w
    ),
    und AS (
        SELECT least(x, y) AS a, greatest(x, y) AS b,
               CAST(count(*) AS BIGINT) AS weight
        FROM pr GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (
        SELECT a AS src, b AS dst, weight FROM und
        UNION ALL
        SELECT b AS src, a AS dst, weight FROM und
    ),
    vertices AS (SELECT DISTINCT src AS id FROM edges),
    outw AS (SELECT src, CAST(sum(weight) AS BIGINT) AS outw
             FROM edges GROUP BY src),
    ew AS MATERIALIZED (
        SELECT e.src, e.dst, e.weight, o.outw
        FROM edges e JOIN outw o ON e.src = o.src
    ),
    s0 AS MATERIALIZED (
        SELECT id, CAST(1.0 AS DOUBLE) AS score FROM vertices
    ),
    {','.join(iters)}
    SELECT id AS word, score FROM {prev}
    ORDER BY score DESC, word
    LIMIT {top_k}
    """


@query("text_textrank_keywords", _textrank_oracle())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): adjacent-token
    co-occurrence edges over the document corpus (window 2, undirected,
    weighted by corpus-wide pair frequency), 8 rounds of weighted TextRank
    (operators/graph.py:weighted_textrank), top-25 words by score. The
    adjacent-pair build is a zip of the token array with its own tail —
    a pure per-row expression, NO positional self-join (the oracle joins
    on position; the engine plan never does) — then one hash aggregate per
    edge direction. Every iteration is differential-tested via the
    unrolled fixed-point CTE oracle, like PageRank/HITS."""
    from hierarchical_graph_db_spark.operators.graph import weighted_textrank

    docs = Catalog(spark, sf_dir).documents
    ts = tokens("text")
    pairs = (
        docs.select(ts.alias("ts"))
        .where(F.size("ts") >= 2)
        .select(F.explode(F.arrays_zip(
            F.slice("ts", 1, F.size("ts") - 1).alias("x"),
            F.slice(F.col("ts"), 2, F.size("ts") - 1).alias("y"),
        )).alias("p"))
        .where(F.col("p.x") != F.col("p.y"))
    )
    und = (
        pairs.select(F.least("p.x", "p.y").alias("a"),
                     F.greatest("p.x", "p.y").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    edges = und.select(F.col("a").alias("src"), F.col("b").alias("dst"),
                       "weight").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"),
                   "weight"))
    scores = weighted_textrank(edges, n_iter=8)
    return (
        scores.select(F.col("id").alias("word"), "score")
        .orderBy(F.desc("score"), F.asc("word"))
        .limit(25)
    )


@query(
    "text_ngram_novelty",
    """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               t.w1 || ' ' || t.w2 || ' ' || t.w3 AS shingle
        FROM (
            SELECT doc_id,
                   unnest(ts[1:len(ts)-2]) AS w1,
                   unnest(ts[2:len(ts)-1]) AS w2,
                   unnest(ts[3:len(ts)])   AS w3
            FROM toks WHERE len(ts) >= 3
        ) t
    ),
    firstseen AS (
        SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS novelty
    FROM sh s JOIN firstseen f USING (shingle)
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct word
    trigrams whose FIRST corpus appearance (min doc_id — ingestion order)
    is this doc — the curation metric that separates template boilerplate
    (novelty → 0) from fresh content, and attributes near-dup clusters to
    their earliest member. One shingle build (row-local zip — parallel
    unnest in the oracle), one min-aggregate over shingles (map-side
    collapse; a viral shingle is ONE row here), one join back keyed on the
    shingle, one per-doc aggregate."""
    docs = Catalog(spark, sf_dir).documents
    ts = tokens("text")
    n = F.size("ts")
    tri = F.zip_with(
        F.slice("ts", 1, n - 2),
        F.zip_with(F.slice(F.col("ts"), 2, n - 2),
                   F.slice(F.col("ts"), 3, n - 2),
                   lambda b, c: F.concat_ws(" ", b, c)),
        lambda a, bc: F.concat_ws(" ", a, bc))
    sh = (docs.select("doc_id", ts.alias("ts"))
          .where(n >= 3)
          .select("doc_id", F.explode(F.array_distinct(tri)).alias("shingle")))
    firstseen = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        sh.join(firstseen, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"),
             F.sum(novel).cast("bigint").alias("n_novel"),
             F.round(F.sum(novel) / F.count(F.lit(1)).cast("double"), 6)
             .alias("novelty"))
    )


# --- RAKE keyphrases ---------------------------------------------------------


@query(
    "text_rake_keyphrases",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS w,
               unnest(range(1, len({_SQL_TOKENS}) + 1)) AS pos
        FROM documents
        WHERE len(trim(text)) > 0
    ),
    marked AS (
        SELECT doc_id, w, pos,
               CASE WHEN lower(w) IN {_SQL_STOPLIST} THEN 1 ELSE 0 END
                   AS is_stop
        FROM tok
    ),
    islands AS (
        SELECT doc_id, w, pos, is_stop,
               sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ),
    phr AS (
        SELECT doc_id, island,
               string_agg(w, ' ' ORDER BY pos) AS phrase,
               CAST(count(*) AS BIGINT) AS plen
        FROM islands WHERE is_stop = 0
        GROUP BY doc_id, island
    ),
    words AS (
        SELECT doc_id, island, plen, unnest(string_split(phrase, ' ')) AS w
        FROM phr
    ),
    wstat AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(plen - 1) AS BIGINT) AS deg
        FROM words GROUP BY w
    ),
    scored AS (
        -- word scores quantized to 1e-6 bigints before the phrase sum:
        -- integer addition commutes under any partial-aggregation order
        SELECT p.doc_id, p.island, p.phrase,
               sum(CAST(round((1 + s.deg / CAST(s.freq AS DOUBLE))
                              * 1000000) AS BIGINT)) / 1000000.0 AS score
        FROM words wd
        JOIN wstat s ON s.w = wd.w
        JOIN phr p ON p.doc_id = wd.doc_id AND p.island = wd.island
        GROUP BY p.doc_id, p.island, p.phrase
    )
    SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
           round(min(score), 6) AS rake_score
    FROM scored
    GROUP BY phrase
    ORDER BY round(min(score), 6) DESC, phrase
    LIMIT 15
    """,
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010, public method):
    candidate phrases are maximal stopword-free token runs
    (gaps-and-islands over the token stream — one doc-local window), word
    scores are deg/freq over phrase co-occurrence, phrase score sums its
    words' scores; top-15 distinct phrases. The phrase-level complement to
    TextRank's word graph — no iteration, two hash aggregates and a
    word-keyed join. Identical phrases score identically by construction
    (min(score) is a no-op collapse), and the score's deg/freq rationals
    divide once per word — deterministic both engines."""
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).documents
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", F.posexplode(tokens("text"))
                    .alias("pos", "w")))
    marked = toks.withColumn(
        "is_stop",
        F.when(F.lower("w").isin(*EN_STOPWORDS), 1).otherwise(0))
    w_doc = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = marked.withColumn("island", F.sum("is_stop").over(w_doc))
    phr = (islands.where(F.col("is_stop") == 0)
           .groupBy("doc_id", "island")
           .agg(F.array_join(
               F.transform(F.sort_array(F.collect_list(
                   F.struct("pos", "w"))), lambda s: s["w"]), " ")
               .alias("phrase"),
               F.count(F.lit(1)).alias("plen")))
    words = phr.select("doc_id", "island", "plen",
                       F.explode(F.split("phrase", " ")).alias("w"))
    wstat = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("plen") - 1).cast("bigint").alias("deg"))
    scored = (
        words.join(wstat, "w")
        .groupBy("doc_id", "island")
        .agg((F.sum(F.round((F.lit(1.0) + F.col("deg")
                             / F.col("freq").cast("double"))
                            * 1000000).cast("bigint"))
              / F.lit(1000000.0)).alias("score"))
        .join(phr.select("doc_id", "island", "phrase"),
              ["doc_id", "island"])
    )
    return (
        scored.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_occurrences"),
             F.round(F.min("score"), 6).alias("rake_score"))
        .orderBy(F.desc("rake_score"), F.asc("phrase"))
        .limit(15)
    )


@query(
    "text_nfc_normalize",
    """
    WITH dec AS (
        SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(length(t) AS BIGINT)                    AS len_decomposed,
           CAST(length(nfc_normalize(t)) AS BIGINT)     AS len_nfc,
           CAST(length(t) - length(nfc_normalize(t)) AS BIGINT)
                                                        AS n_composed,
           length(t) <> length(nfc_normalize(t))        AS changed
    FROM dec
    """,
)
def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization stats per doc. The ASCII fixture is first
    given deterministic decomposed sequences (every 'e' → 'e' + U+0301
    combining acute) IN BOTH ENGINES, then normalized — NFC composes each
    pair to 'é', so ``n_composed`` counts the compositions and both
    engines' length/arithmetic agree exactly
    (functions/text.py:nfc_normalize_docs; the seam a multilingual corpus
    runs before any fingerprint/shingle stage)."""
    from hierarchical_graph_db_spark.functions.text import nfc_normalize_docs

    docs = Catalog(spark, sf_dir).documents
    dec = docs.select(
        "doc_id",
        # the DECOMPOSED sequence, written as an escape on purpose —
        # a literal would invite silent editor/tooling renormalization
        F.regexp_replace("text", "e", "e\u0301").alias("text"),
    )
    lens = dec.select("doc_id", F.length("text").cast("long").alias("len_decomposed"))
    nfc = nfc_normalize_docs(dec)
    return (
        lens.join(nfc, on="doc_id")
        .select(
            "doc_id",
            "len_decomposed",
            F.length("text_nfc").cast("long").alias("len_nfc"),
            (F.col("len_decomposed") - F.length("text_nfc").cast("long"))
            .alias("n_composed"),
            (F.col("len_decomposed") != F.length("text_nfc").cast("long"))
            .alias("changed"),
        )
    )
