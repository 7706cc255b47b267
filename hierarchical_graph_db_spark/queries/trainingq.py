"""Training-data pipeline queries (north-star LLM-pipeline ops, SURVEY.md §2.11).

The six post-curation stages — decontamination, sequence packing, stratified
sampling, domain mixture planning, PII redaction, repetition metrics — each
demonstrated over ``documents`` with a hash-checked DuckDB oracle. Oracles are
generated from the SAME Python constants the operators use (PII patterns,
sampling thresholds, mixture weights), so the contract can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.training import (
    PII_PATTERNS,
    decontaminate,
    domain_mixture,
    pack_sequences,
    redact_pii,
    repetition_metrics,
    stratified_sample,
)
from hierarchical_graph_db_spark.queries import query

# The cross-engine contract constants are imported, not re-declared: the
# normalization string and BPE-ish piece regex each live in exactly one
# module (dedup.py / textq.py), so a contract change cannot silently desync
# these oracles from the operators they verify.
from hierarchical_graph_db_spark.queries.dedup import _NORM  # noqa: E402
from hierarchical_graph_db_spark.queries.textq import _SQL_PIECES  # noqa: E402

#: Tokenized-position CTE shared by every shingle oracle (same as dedup.py).
_TOKS_CTE = f"""
    toks AS MATERIALIZED (
        SELECT id, u.s.tok AS tok, u.s.pos AS pos
        FROM (
            SELECT doc_id AS id,
                   unnest(list_transform(string_split_regex({_NORM}, '\\s+'),
                                         (x, i) -> {{'tok': x, 'pos': i - 1}})) AS s
            FROM documents
        ) u
    )
"""

#: BPE-ish LLM token estimate (same contract as textq.token_count_bpeish).
_SQL_EST = (
    f"CAST(list_sum(list_transform({_SQL_PIECES}, "
    "p -> CASE WHEN regexp_matches(p, '^[A-Za-z]+$') "
    "THEN CAST(ceil(length(p) / 4.0) AS BIGINT) ELSE 1 END)) AS BIGINT)"
)

# ---------------------------------------------------------------------------
# Decontamination: 5-gram overlap against the held-out benchmark slice.
# ---------------------------------------------------------------------------

#: Every doc_id ≡ 0 (mod 29) plays the benchmark/eval set; the rest train.
DECON_BENCH_MOD = 29
DECON_NGRAM = 5


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH {_TOKS_CTE},
    sh AS MATERIALIZED (
        SELECT DISTINCT t0.id,
               t0.tok || ' ' || t1.tok || ' ' || t2.tok || ' ' ||
               t3.tok || ' ' || t4.tok AS shingle
        FROM toks t0
        JOIN toks t1 ON t1.id = t0.id AND t1.pos = t0.pos + 1
        JOIN toks t2 ON t2.id = t0.id AND t2.pos = t0.pos + 2
        JOIN toks t3 ON t3.id = t0.id AND t3.pos = t0.pos + 3
        JOIN toks t4 ON t4.id = t0.id AND t4.pos = t0.pos + 4
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE id % {DECON_BENCH_MOD} = 0),
    hits AS (
        SELECT sh.id, CAST(count(*) AS BIGINT) AS n_hit_shingles
        FROM sh JOIN bench USING (shingle)
        WHERE sh.id % {DECON_BENCH_MOD} <> 0
        GROUP BY sh.id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_hit_shingles, 0) AS BIGINT) AS n_hit_shingles,
           h.n_hit_shingles IS NOT NULL AS contaminated
    FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
    WHERE d.doc_id % {DECON_BENCH_MOD} <> 0
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: a training doc is contaminated iff it shares
    any word 5-gram with the benchmark slice (doc_id ≡ 0 mod 29 stands in for
    the eval set). The benchmark shingle set broadcasts; the train side never
    shuffles before the per-doc hit count."""
    docs = Catalog(spark, sf_dir).documents
    bench = docs.where(F.col("doc_id") % DECON_BENCH_MOD == 0)
    train = docs.where(F.col("doc_id") % DECON_BENCH_MOD != 0)
    return decontaminate(train, bench, n=DECON_NGRAM)


# ---------------------------------------------------------------------------
# Sequence packing: concat-and-chunk into fixed context windows.
# ---------------------------------------------------------------------------

PACK_CTX_TOKENS = 256


@query(
    "pack_sequences_greedy",
    f"""
    WITH est AS (
        SELECT doc_id, source, {_SQL_EST} AS est_tokens FROM documents
    ),
    c AS (
        SELECT doc_id, source, est_tokens,
               coalesce(sum(est_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
        FROM est WHERE est_tokens > 0
    )
    SELECT doc_id, source, CAST(est_tokens AS BIGINT) AS est_tokens,
           CAST(floor(cum_before / {PACK_CTX_TOKENS}.0) AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_CTX_TOKENS} AS BIGINT) AS pack_offset,
           floor((cum_before + est_tokens - 1) / {PACK_CTX_TOKENS}.0)
             > floor(cum_before / {PACK_CTX_TOKENS}.0) AS spans_boundary
    FROM c
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, pretraining layout: per source domain, docs are
    concatenated in doc_id order and the token stream is chunked into
    256-token context windows; each doc reports the pack it starts in, its
    offset, and whether it spans a pack boundary. One running-total window
    per domain — no global coordination."""
    return pack_sequences(
        Catalog(spark, sf_dir).documents, ctx_tokens=PACK_CTX_TOKENS
    )


# ---------------------------------------------------------------------------
# Stratified sampling: deterministic hash-based keep decisions.
# ---------------------------------------------------------------------------

#: Per-language sampling rates (the "downsample the easy languages" table).
SAMPLE_RATES = {"en": 0.9, "de": 0.6, "es": 0.6, "fr": 0.6, "zh": 0.3}
SAMPLE_DEFAULT_RATE = 0.2
SAMPLE_SALT = "samp"


def _sql_u16(hex_expr: str) -> str:
    """DuckDB twin of operators.training.uniform16: first 4 hex nibbles of a
    sha256 hex string as an integer (no hex→int builtin in DuckDB)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({hex_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


def _sql_rate_case() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {int(rate * 65536)}"
        for lang, rate in sorted(SAMPLE_RATES.items())
    )
    return f"CASE lang {whens} ELSE {int(SAMPLE_DEFAULT_RATE * 65536)} END"


@query(
    "stratified_sample_hash",
    f"""
    WITH h AS (
        SELECT doc_id, lang,
               sha256('{SAMPLE_SALT}|' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    )
    SELECT doc_id, lang,
           CAST({_sql_u16("hx")} AS BIGINT) AS u16,
           {_sql_u16("hx")} < {_sql_rate_case()} AS keep
    FROM h
    """,
)
def stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep iff the doc's salted sha256
    uniform (16-bit) clears its language's integer threshold. Bit-exact across
    engines and re-runs — the reproducible-corpus contract (raising a rate
    only adds docs, never swaps them)."""
    return stratified_sample(
        Catalog(spark, sf_dir).documents,
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
        salt=SAMPLE_SALT,
    )


# ---------------------------------------------------------------------------
# Domain mixture planning: token census → repeat factors.
# ---------------------------------------------------------------------------

#: Target mixture weights per source domain (deterministic 1..4 pattern —
#: stands in for the hand-tuned DoReMi/Pile-style mixture table).
MIXTURE_WEIGHTS = {f"src{i}": float((i % 4) + 1) for i in range(20)}


def _sql_target_case() -> str:
    total = sum(MIXTURE_WEIGHTS.values())
    whens = " ".join(
        f"WHEN '{dom}' THEN {round(wgt / total, 6)}"
        for dom, wgt in sorted(MIXTURE_WEIGHTS.items())
    )
    return f"CASE source {whens} ELSE NULL END"


@query(
    "domain_mixture_plan",
    f"""
    WITH est AS (SELECT source, {_SQL_EST} AS est FROM documents),
    d AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(est) AS BIGINT) AS domain_tokens
        FROM est GROUP BY source
    )
    SELECT source, n_docs, domain_tokens,
           round(domain_tokens / CAST(sum(domain_tokens) OVER () AS DOUBLE), 6)
               AS natural_share,
           {_sql_target_case()} AS target_share,
           round({_sql_target_case()} * CAST(sum(domain_tokens) OVER () AS DOUBLE)
                 / domain_tokens, 4) AS repeat_factor
    FROM d
    """,
)
def domain_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture planning table: per-source token census, natural vs
    target share, and the repeat factor a sampler applies to hit the target
    mixture. The window total runs over one row per domain — free at any
    corpus scale."""
    return domain_mixture(
        Catalog(spark, sf_dir).documents, weights=MIXTURE_WEIGHTS
    )


# ---------------------------------------------------------------------------
# PII redaction: ordered regex scrub with per-type counts.
# ---------------------------------------------------------------------------

#: Synthetic contact-block suffix (the fixture corpus has no PII by
#: construction — zero digits — so each doc gets a deterministic doc_id-derived
#: e-mail / IPv4 / SSN / phone appended; redaction then has real work whose
#: output is hash-checked byte-for-byte).
_SQL_CONTACT_SUFFIX = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com ip 10.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.0.1 ssn '"
    " || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'"
    " || CAST(doc_id % 90 + 10 AS VARCHAR) || '-'"
    " || CAST(doc_id % 9000 + 1000 AS VARCHAR)"
    " || ' tel 415-555-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)"
)


def _pii_oracle() -> str:
    """Build the redaction oracle from the SAME PII_PATTERNS the operator
    applies, in the same order, counting on the progressively-redacted text."""
    sql = f"WITH r0 AS (SELECT doc_id, text || {_SQL_CONTACT_SUFFIX} AS t0 FROM documents)"
    carry: list[str] = []
    for step, (name, pat, repl) in enumerate(PII_PATTERNS):
        prev, cur = f"t{step}", f"t{step + 1}"
        carry_cols = ", ".join(carry) + ", " if carry else ""
        sql += f""",
    r{step + 1} AS (
        SELECT doc_id, {carry_cols}
               CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT) AS n_{name},
               regexp_replace({prev}, '{pat}', '{repl}', 'g') AS {cur}
        FROM r{step}
    )"""
        carry.append(f"n_{name}")
    final = f"t{len(PII_PATTERNS)}"
    return sql + f"""
    SELECT doc_id, sha256({final}) AS redacted_fp, {", ".join(carry)}
    FROM r{len(PII_PATTERNS)}
    """


@query("pii_redaction", _pii_oracle())
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents (with a deterministic synthetic contact block
    appended, since the fixture text is digit-free): e-mails, SSNs, phones,
    IPv4s replaced in order by typed tokens; counts reflect what was actually
    replaced; the redacted text is compared by sha256. Narrow per-row
    projection — no shuffle, codegen-friendly."""
    i = F.col("doc_id")
    suffix = F.concat(
        F.lit(" contact user"), i.cast("string"),
        F.lit("@mail.example.com ip 10."), (i % 256).cast("string"),
        F.lit(".0.1 ssn "), (i % 900 + 100).cast("string"),
        F.lit("-"), (i % 90 + 10).cast("string"),
        F.lit("-"), (i % 9000 + 1000).cast("string"),
        F.lit(" tel 415-555-"), (i % 9000 + 1000).cast("string"),
    )
    aug = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    red = redact_pii(aug)
    return red.select(
        "doc_id",
        F.sha2(F.col("redacted"), 256).alias("redacted_fp"),
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
    )


# ---------------------------------------------------------------------------
# Train/val/test split: deterministic hash buckets.
# ---------------------------------------------------------------------------

#: u16 boundaries for an 80/10/10 split (Python-precomputed integers so the
#: assignment is bit-exact in both engines, like the sampling thresholds).
SPLIT_SALT = "split"
SPLIT_TRAIN_LT = int(0.8 * 65536)   # 52428
SPLIT_VAL_LT = int(0.9 * 65536)     # 58982


@query(
    "train_val_test_split",
    f"""
    WITH h AS (
        SELECT doc_id,
               sha256('{SPLIT_SALT}|' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN {_sql_u16("hx")} < {SPLIT_TRAIN_LT} THEN 'train'
                WHEN {_sql_u16("hx")} < {SPLIT_VAL_LT} THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split on the salted document hash: every
    engine, every rerun, every shard assigns the same doc to the same split
    (and a doc can never migrate between train and eval when the corpus
    grows — the property random splits lack)."""
    from hierarchical_graph_db_spark.operators.training import uniform16

    u = uniform16(F.col("doc_id"), SPLIT_SALT)
    split = (
        F.when(u < SPLIT_TRAIN_LT, "train")
        .when(u < SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    return Catalog(spark, sf_dir).documents.select(
        "doc_id", split.alias("split")
    )


# ---------------------------------------------------------------------------
# Feature normalization: per-group z-score + min-max.
# ---------------------------------------------------------------------------


@query(
    "feature_normalize_events",
    """
    WITH s AS (
        SELECT event_id, value,
               CAST(count(*) OVER per_user AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                    OVER per_user AS BIGINT) AS sv_cells,
               CAST(sum(CAST(floor(value * value * 1000.0 + 0.5) AS BIGINT))
                    OVER per_user AS BIGINT) AS sq_cells,
               min(value) OVER per_user AS vmin,
               max(value) OVER per_user AS vmax
        FROM events
        WINDOW per_user AS (PARTITION BY user_id)
    )
    , z AS (
        SELECT event_id, value, vmin, vmax,
               (sv_cells / 1000000.0) / n AS mean,
               CASE WHEN n > 1 THEN
                   sqrt(greatest((sq_cells / 1000.0
                                  - ((sv_cells / 1000000.0) / n)
                                    * ((sv_cells / 1000000.0) / n) * n)
                                 / (n - 1), 0.0))
               END AS sd
        FROM s
    )
    SELECT event_id,
           CASE WHEN sd > 0 THEN
               floor((value - mean) / sd * 1000000.0 + 0.5) / 1000000.0 + 0
           END AS value_zscore,
           CASE WHEN vmax > vmin THEN
               floor((value - vmin) / (vmax - vmin) * 1000000.0 + 0.5)
                   / 1000000.0
           END AS value_minmax
    FROM z
    """,
)
def feature_normalize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity feature scaling (the feature-prep staple): z-score and
    min-max of each event's value within its user's distribution — one
    unordered window per user, no self-joins. Cross-engine determinism
    (the queries/__init__ parity rule): the mean and variance come from
    fixed-point cell sums over the window (order-free int64), and both
    outputs quantize floor-based — min-max of 2dp inputs lands on exact
    decimal …5 boundaries routinely (sf1 flipped two rows under the
    engines' decimal round), and avg/stddev float sums are
    partition-order dependent."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    value = F.col("value")
    n = F.count(F.lit(1)).over(w)
    sv = F.sum(F.floor(value * F.lit(1000000.0) + F.lit(0.5))).over(w)
    sq = F.sum(F.floor(value * value * F.lit(1000.0) + F.lit(0.5))).over(w)
    mean = (sv / F.lit(1000000.0)) / n
    var = (sq / F.lit(1000.0) - mean * mean * n) / (n - F.lit(1))
    sd = F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0))))
    vmin = F.min(value).over(w)
    vmax = F.max(value).over(w)

    def _q6(c):
        return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)

    return Catalog(spark, sf_dir).events.select(
        "event_id",
        F.when(sd > 0, _q6((value - mean) / sd) + F.lit(0.0))
        .alias("value_zscore"),
        F.when(vmax > vmin, _q6((value - vmin) / (vmax - vmin)))
        .alias("value_minmax"),
    )


# ---------------------------------------------------------------------------
# Repetition metrics: within-doc duplicate n-grams.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Document chunking: overlapping token windows (RAG/embedding prep).
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
_CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


@query(
    "chunk_documents_overlap",
    f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents WHERE length(trim(text)) > 0
    ),
    s AS (
        SELECT doc_id, toks,
               unnest(generate_series(0,
                   greatest(len(toks) - {CHUNK_OVERLAP} - 1, 0),
                   {_CHUNK_STRIDE})) AS start
        FROM t
    )
    SELECT doc_id,
           CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(toks[start + 1 : start + {CHUNK_TOKENS}]) AS BIGINT)
               AS n_chunk_tokens,
           array_to_string(toks[start + 1 : start + {CHUNK_TOKENS}], ' ')
               AS chunk_text
    FROM s
    """,
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token windows, 8-token overlap)
    — the RAG / embedding-prep shape. Pure array expressions, explode, zero
    shuffles; the tail rule (a chunk must contribute ≥1 new token) is pinned
    in pytest and replayed by the oracle's generate_series bound."""
    from hierarchical_graph_db_spark.operators.training import chunk_documents

    return chunk_documents(Catalog(spark, sf_dir).documents,
                           chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP)


# ---------------------------------------------------------------------------
# Packing efficiency rollup (consumes the pack assignment).
# ---------------------------------------------------------------------------


@query(
    "packing_efficiency",
    f"""
    WITH est AS (
        SELECT doc_id, source, {_SQL_EST} AS est_tokens FROM documents
    ),
    c AS (
        SELECT doc_id, source, est_tokens,
               coalesce(sum(est_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
        FROM est WHERE est_tokens > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(est_tokens) AS BIGINT) AS total_tokens,
           CAST(ceil(sum(est_tokens) / {PACK_CTX_TOKENS}.0) AS BIGINT) AS n_packs,
           round(sum(est_tokens)
                 / (ceil(sum(est_tokens) / {PACK_CTX_TOKENS}.0)
                    * {PACK_CTX_TOKENS}.0), 6) AS fill_ratio,
           round(avg(CASE WHEN floor((cum_before + est_tokens - 1)
                                     / {PACK_CTX_TOKENS}.0)
                               > floor(cum_before / {PACK_CTX_TOKENS}.0)
                          THEN 1.0 ELSE 0.0 END), 6) AS boundary_span_rate
    FROM c GROUP BY source
    """,
)
def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report per domain: packs needed (concat-and-chunk
    fills every window except the last), fill ratio of the allocated windows,
    and the fraction of docs spanning a pack boundary (the fragmentation
    stat attention-masking cares about)."""
    from hierarchical_graph_db_spark.operators.training import pack_sequences

    packs = pack_sequences(Catalog(spark, sf_dir).documents,
                           ctx_tokens=PACK_CTX_TOKENS)
    ctx = float(PACK_CTX_TOKENS)
    total = F.sum("est_tokens")
    n_packs = F.ceil(total / ctx)
    return packs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        total.cast("long").alias("total_tokens"),
        n_packs.cast("long").alias("n_packs"),
        F.round(total / (n_packs * ctx), 6).alias("fill_ratio"),
        F.round(F.avg(F.when(F.col("spans_boundary"), 1.0).otherwise(0.0)), 6)
        .alias("boundary_span_rate"),
    )


# ---------------------------------------------------------------------------
# Exact-k per-stratum sampling: hash-rank reservoir.
# ---------------------------------------------------------------------------

SAMPLE_K_PER_STRATUM = 40


@query(
    "sample_topk_per_stratum",
    f"""
    WITH h AS (
        SELECT doc_id, lang,
               sha256('{SAMPLE_SALT}|' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, CAST({_sql_u16("hx")} AS BIGINT) AS u16,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY {_sql_u16("hx")}, doc_id) AS rk
        FROM h
    )
    SELECT doc_id, lang, u16, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {SAMPLE_K_PER_STRATUM}
    """,
)
def sample_topk_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k reservoir per stratum, deterministically: rank docs inside
    each language by their salted hash (ties by id) and keep the first k —
    a reproducible 'exactly N per group' sample (rate-based sampling can't
    promise exact counts). One window per stratum; at scale this is the
    distributed reservoir: partial top-k per partition, merge of k-lists."""
    from pyspark.sql import Window

    from hierarchical_graph_db_spark.operators.training import uniform16

    docs = Catalog(spark, sf_dir).documents
    w = Window.partitionBy("lang").orderBy("u16", "doc_id")
    return (
        docs.select("doc_id", "lang",
                    uniform16(F.col("doc_id"), SAMPLE_SALT).alias("u16"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= SAMPLE_K_PER_STRATUM)
    )


# ---------------------------------------------------------------------------
# Weighted priority sampling: exact-k per stratum, weight-biased.
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 30


@query(
    "weighted_sample_priority",
    f"""
    WITH h AS (
        SELECT doc_id, lang, n_chars,
               sha256('{SAMPLE_SALT}|' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, n_chars,
               round({_sql_u16("hx")} / CAST(n_chars AS DOUBLE), 6) AS priority,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_sql_u16("hx")} / CAST(n_chars AS DOUBLE)
                       NULLS LAST, doc_id
               ) AS rk
        FROM h
    )
    SELECT doc_id, lang, n_chars, priority, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {WEIGHTED_SAMPLE_K}
    """,
)
def weighted_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-biased exact-k sampling (priority sampling): within each
    language keep the k docs with the smallest salted-uniform / weight
    priority, weighting by document length — longer docs are
    proportionally likelier, yet the draw stays deterministic and
    reproducible (same salt → same sample). All arithmetic is
    small-integer division in IEEE doubles, bit-exact across engines.
    A zero-length doc's priority is NULL (u16/0) — ordered NULLS LAST
    explicitly in both engines (their defaults differ), i.e. zero-weight
    docs are drawn only when a stratum has fewer than k positive-weight
    docs."""
    from pyspark.sql import Window

    from hierarchical_graph_db_spark.operators.training import uniform16

    docs = Catalog(spark, sf_dir).documents
    pri = uniform16(F.col("doc_id"), SAMPLE_SALT) / F.col("n_chars").cast("double")
    w = Window.partitionBy("lang").orderBy(pri.asc_nulls_last(), "doc_id")
    return (
        docs.select("doc_id", "lang", "n_chars",
                    F.round(pri, 6).alias("priority"),
                    F.row_number().over(w).cast("long").alias("rk"))
        .where(F.col("rk") <= WEIGHTED_SAMPLE_K)
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage: token frequency census + cumulative coverage.
# ---------------------------------------------------------------------------


@query(
    "vocab_coverage",
    f"""
    WITH tok AS (
        SELECT unnest(string_split_regex({_NORM}, '\\s+')) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    freq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM tok GROUP BY token
    )
    SELECT token, n_occurrences,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
                AS BIGINT) AS rk,
           round(CAST(sum(n_occurrences) OVER (
                     ORDER BY n_occurrences DESC, token
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE)
                 / CAST(sum(n_occurrences) OVER () AS DOUBLE), 6)
               AS cum_coverage
    FROM freq
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocab planning table: corpus token census ranked by
    frequency with cumulative coverage share (read off 'how many vocab
    entries cover 95% of tokens'). The corpus-wide explode+count combines
    map-side; the ranking window runs over the VOCAB (distinct tokens) —
    orders of magnitude smaller than the corpus, the standard reduction."""
    from pyspark.sql import Window

    from hierarchical_graph_db_spark.functions.hashing import normalized_text
    from hierarchical_graph_db_spark.functions.text import tokens

    docs = Catalog(spark, sf_dir).documents.where(F.length(F.trim("text")) > 0)
    freq = (
        docs.select(F.explode(tokens(normalized_text(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    order = Window.orderBy(F.col("n_occurrences").desc(), "token")
    cum = order.rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()
    return freq.select(
        "token",
        "n_occurrences",
        F.row_number().over(order).cast("long").alias("rk"),
        F.round(
            F.sum("n_occurrences").over(cum).cast("double")
            / F.sum("n_occurrences").over(total).cast("double"),
            6,
        ).alias("cum_coverage"),
    )


@query(
    "repetition_metrics",
    f"""
    WITH {_TOKS_CTE},
    tg AS (
        SELECT t0.id, t0.tok || ' ' || t1.tok || ' ' || t2.tok AS shingle
        FROM toks t0
        JOIN toks t1 ON t1.id = t0.id AND t1.pos = t0.pos + 1
        JOIN toks t2 ON t2.id = t0.id AND t2.pos = t0.pos + 2
    ),
    per AS (SELECT id, shingle, count(*) AS cnt FROM tg GROUP BY 1, 2),
    st AS (
        SELECT id, CAST(sum(cnt) AS BIGINT) AS n_ngrams,
               CAST(count(*) AS BIGINT) AS n_distinct_ngrams,
               CAST(max(cnt) AS BIGINT) AS max_repeat
        FROM per GROUP BY id
    )
    SELECT id AS doc_id, n_ngrams, n_distinct_ngrams,
           round(1 - n_distinct_ngrams / CAST(n_ngrams AS DOUBLE), 6)
               AS dup_ngram_ratio,
           round(max_repeat / CAST(n_ngrams AS DOUBLE), 6) AS top_ngram_share
    FROM st
    """,
)
def repetition_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per doc (≥3 tokens): total vs distinct
    word trigrams, the duplicate fraction, and the most-repeated trigram's
    share — the boilerplate/spam gates a quality pipeline thresholds on.
    Explode + two-level hash aggregate; partials combine map-side."""
    return repetition_metrics(Catalog(spark, sf_dir).documents, n=3)


@query(
    "domain_quota_sample",
    """
    SELECT doc_id, source, CAST(rn AS BIGINT) AS draw_rank FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 15
    """,
)
def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota cap (≤15 docs per source, smallest-sha256 draw) —
    the C4/RefinedWeb hot-domain guard. The rank-limited window rewrites to
    WindowGroupLimit (map-side pre-truncation, plan-pinned in
    tests/test_plans.py), so a mega-domain ships O(cap·maps) rows instead
    of flooding one reducer (operators/training.py:domain_quota_cap)."""
    from hierarchical_graph_db_spark.operators.training import (
        domain_quota_cap,
    )

    docs = Catalog(spark, sf_dir).documents
    return domain_quota_cap(docs, cap=15).select(
        "doc_id", "source", F.col("draw_rank").cast("long").alias("draw_rank"))


_SPAN_SALT, _SPAN_THR = "t5span", int(0.15 * 65536)


@query(
    "span_corruption_pairs",
    f"""
    WITH {_TOKS_CTE},
    m AS (
        SELECT id, pos, tok,
               {_sql_u16(f"sha256('{_SPAN_SALT}|' || CAST(id AS VARCHAR) || ':' || CAST(pos AS VARCHAR))")}
                   < {_SPAN_THR} AS masked
        FROM toks
    ),
    r AS (
        SELECT *, masked AND NOT coalesce(
                   lag(masked) OVER (PARTITION BY id ORDER BY pos), false)
                   AS run_start
        FROM m
    ),
    kk AS (
        SELECT *, sum(CASE WHEN run_start THEN 1 ELSE 0 END)
                      OVER (PARTITION BY id ORDER BY pos) AS k
        FROM r
    ),
    p AS (
        SELECT id, pos,
               CASE WHEN NOT masked THEN tok
                    WHEN run_start THEN '<X' || CAST(k - 1 AS VARCHAR) || '>'
                    END AS p_in,
               CASE WHEN masked AND run_start
                        THEN '<X' || CAST(k - 1 AS VARCHAR) || '> ' || tok
                    WHEN masked THEN tok END AS p_tgt
        FROM kk
    )
    SELECT id AS doc_id,
           coalesce(string_agg(p_in, ' ' ORDER BY pos)
                        FILTER (WHERE p_in IS NOT NULL), '') AS inputs,
           coalesce(string_agg(p_tgt, ' ' ORDER BY pos)
                        FILTER (WHERE p_tgt IS NOT NULL), '') AS targets
    FROM p GROUP BY id
    """,
)
def span_corruption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style denoising pairs: ~15% of tokens masked by the salted-sha256
    draw, contiguous runs collapsed to <Xk> sentinels in the input, masked
    spans emitted sentinel-prefixed as the target — the training-example
    generator, deterministic and fully oracle-replayed (runs, sentinel
    numbering, and both reassembled strings)
    (operators/training.py:span_corrupt)."""
    from hierarchical_graph_db_spark.operators.training import span_corrupt

    return span_corrupt(Catalog(spark, sf_dir).documents, rate=0.15,
                        salt=_SPAN_SALT)


@query(
    "domain_mixture_temperature",
    f"""
    WITH est AS (SELECT source, {_SQL_EST} AS est FROM documents),
    d AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(est) AS BIGINT) AS domain_tokens
        FROM est GROUP BY source
    ),
    q AS (
        SELECT *, CAST(round(pow(CAST(domain_tokens AS DOUBLE), 0.3)
                             * 1000000) AS BIGINT) AS wq
        FROM d
    )
    SELECT source, n_docs, domain_tokens,
           round(domain_tokens
                 / CAST(sum(domain_tokens) OVER () AS DOUBLE), 6)
               AS natural_share,
           round(wq / CAST(sum(wq) OVER () AS DOUBLE), 6) AS temp_share,
           round((wq / CAST(sum(wq) OVER () AS DOUBLE))
                 * CAST(sum(domain_tokens) OVER () AS DOUBLE)
                 / domain_tokens, 4) AS repeat_factor
    FROM q
    """,
)
def domain_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture shares pᵢ ∝ tokensᵢ^0.3 per source
    domain (operators/training.py:temperature_mixture) — the data-driven
    alternative to the explicit-weight mixture plan. pow() outputs are
    1e-6-quantized to bigints before the share normalization, so the
    denominators are exact integer sums in both engines."""
    from hierarchical_graph_db_spark.operators.training import (
        temperature_mixture,
    )

    return temperature_mixture(Catalog(spark, sf_dir).documents, alpha=0.3)


@query(
    "temporal_split_leakage",
    """
    WITH labeled AS (
        SELECT user_id, event_id,
               ts >= TIMESTAMP '2024-01-22' AS is_test
        FROM events
    ),
    halves AS (
        SELECT CAST(count(*) FILTER (WHERE NOT is_test) AS BIGINT)
                   AS n_train,
               CAST(count(*) FILTER (WHERE is_test) AS BIGINT) AS n_test
        FROM labeled
    ),
    users AS (
        SELECT user_id,
               max(CASE WHEN is_test THEN 0 ELSE 1 END) = 1 AS in_train,
               max(CASE WHEN is_test THEN 1 ELSE 0 END) = 1 AS in_test
        FROM labeled GROUP BY user_id
    ),
    ustat AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CASE WHEN in_train AND in_test THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_overlap
        FROM users
    )
    SELECT h.n_train, h.n_test, u.n_users, u.n_overlap,
           round(u.n_overlap / CAST(u.n_users AS DOUBLE), 6)
               AS entity_leakage
    FROM halves h CROSS JOIN ustat u
    """,
)
def temporal_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split (cutoff 2024-01-22) with an ENTITY-LEAKAGE
    report: how many users appear on both sides of the time boundary —
    the check that separates a valid forecasting split from one that
    leaks user identity across it (group-aware splitting, standard ML
    hygiene; the hash split in train_val_test_split is the
    entity-disjoint alternative this report motivates). Two aggregates,
    both map-side-collapsing; the per-user flags collapse to one row per
    user before the overlap count."""
    ev = Catalog(spark, sf_dir).events
    labeled = ev.select(
        "user_id",
        (F.col("ts") >= F.lit("2024-01-22").cast("timestamp"))
        .alias("is_test"))
    halves = labeled.agg(
        F.sum(F.when(~F.col("is_test"), 1).otherwise(0)).cast("bigint")
        .alias("n_train"),
        F.sum(F.when(F.col("is_test"), 1).otherwise(0)).cast("bigint")
        .alias("n_test"))
    users = labeled.groupBy("user_id").agg(
        (F.max(F.when(~F.col("is_test"), 1).otherwise(0)) == 1)
        .alias("in_train"),
        (F.max(F.when(F.col("is_test"), 1).otherwise(0)) == 1)
        .alias("in_test"))
    ustat = users.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("in_train") & F.col("in_test"), 1).otherwise(0))
        .cast("bigint").alias("n_overlap"))
    return (
        halves.crossJoin(F.broadcast(ustat))
        .select("n_train", "n_test", "n_users", "n_overlap",
                F.round(F.col("n_overlap")
                        / F.col("n_users").cast("double"), 6)
                .alias("entity_leakage"))
    )
