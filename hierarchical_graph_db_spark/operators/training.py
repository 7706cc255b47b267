"""Training-data pipeline operators (north-star LLM-pipeline ops, SURVEY.md §2.11).

The six stages a pretraining corpus pipeline runs after curation, each as a
pure-Catalyst DataFrame operator with an ANSI-SQL twin in the DuckDB oracles:

* decontamination — n-gram overlap of the training corpus against a held-out
  benchmark/eval set; any shared shingle flags the training doc.
* sequence packing — concat-and-chunk assignment of documents to fixed-size
  context windows (the GPT/Llama pretraining layout).
* stratified sampling — deterministic hash-based per-stratum downsampling
  (same doc always kept/dropped for the same salt → reproducible corpora).
* domain mixture planning — per-domain token census + target-weight repeat
  factors (the "how many epochs of each domain" table).
* PII redaction — regex scrub of emails / SSNs / phones / IPv4s with typed
  replacement tokens and per-type match counts.
* repetition metrics — within-document duplicate n-gram ratios (the Gopher
  repetition signals used as quality gates).

Scale notes (100 TB posture):
* Decontamination broadcasts the BENCHMARK shingle set — eval benchmarks are
  MBs even when the train side is 100 TB, so the corpus streams map-side with
  no shuffle until the per-doc hit count.
* Packing is one window per (domain, order) partition — the same shape as any
  running total; no global coordination (packs are domain-local by design,
  which is also what keeps the operator deterministic under re-partitioning).
* Sampling/redaction/repetition are narrow per-row expressions (sampling and
  redaction shuffle nothing; repetition shuffles once on doc_id like every
  shingle aggregate).

Reference parity: the reference has no training-data layer at all (its scope
ends at ingest + declared-but-empty analysis agents, README.md:86-88); this
family is the engine's north-star extension mandated by SURVEY.md §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.functions.text import llm_token_estimate, tokens
from hierarchical_graph_db_spark.operators.dedup_fuzzy import shingles

#: PII patterns applied IN ORDER to progressively-redacted text; each is
#: RE2-safe (no backtracking constructs) so the identical pattern runs in
#: Spark (Java regex) and DuckDB (RE2) with the same match language.
#: (name, pattern, replacement) — order matters: e-mail first so its digits
#: can't be re-matched, then the 3-2-4 SSN shape, 3-3-4 phones, dotted IPv4.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IPV4>"),
)


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 5,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Flag training docs sharing any word ``n``-gram with the benchmark set.

    Returns one row per training doc: (id, n_hit_shingles, contaminated).
    ``n_hit_shingles`` counts the doc's DISTINCT shingles that appear anywhere
    in the benchmark (the standard 13-gram-overlap decontamination shape, at a
    fixture-friendly n).

    The benchmark shingle set is broadcast: eval sets stay small by
    construction, so the 100 TB train side never shuffles for the probe —
    this is a broadcast semi-join per shingle, then one hash aggregate.
    """
    bench_sh = (
        shingles(benchmark, n=n, id_col=id_col, text_col=text_col)
        .select("shingle").distinct()
    )
    doc_sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    hits = (
        doc_sh.join(F.broadcast(bench_sh), on="shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit_shingles"))
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(hits, on="id", how="left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_hit_shingles", F.lit(0)).cast("long").alias("n_hit_shingles"),
        F.col("n_hit_shingles").isNotNull().alias("contaminated"),
    )


def pack_sequences(docs: DataFrame, ctx_tokens: int = 256,
                   domain_col: str = "source", order_col: str = "doc_id",
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Concat-and-chunk sequence packing: assign each doc its context window.

    The pretraining layout: within each domain, documents are concatenated in
    a deterministic order and the token stream is chunked into fixed
    ``ctx_tokens`` windows. Each doc gets the pack it STARTS in, its offset
    there, and whether it spills across a pack boundary (the fragmentation
    stat packing efficiency reports track).

    One window function per domain partition — a running total, no global
    state; domains pack independently (and deterministically under any
    physical partitioning because the order column is total per domain).
    """
    est = llm_token_estimate(F.col(text_col)).alias("est_tokens")
    w = (
        Window.partitionBy(domain_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep = [id_col, domain_col] + ([order_col] if order_col not in
                                   (id_col, domain_col) else [])
    base = docs.select(*[F.col(c) for c in keep], est).where(
        F.col("est_tokens") > 0
    )
    cum_before = F.coalesce(F.sum("est_tokens").over(w), F.lit(0)).alias("cum_before")
    packed = base.select(id_col, domain_col, "est_tokens", cum_before)
    ctx = F.lit(ctx_tokens)
    pack_id = F.floor(F.col("cum_before") / ctx)
    last_pack = F.floor((F.col("cum_before") + F.col("est_tokens") - 1) / ctx)
    return packed.select(
        F.col(id_col),
        F.col(domain_col),
        F.col("est_tokens"),
        pack_id.cast("long").alias("pack_id"),
        (F.col("cum_before") % ctx).cast("long").alias("pack_offset"),
        (last_pack > pack_id).alias("spans_boundary"),
    )


def uniform16(key: F.Column, salt: str) -> F.Column:
    """Deterministic uniform hash in [0, 65536): first 4 hex nibbles of
    sha256(salt|key). Engine-portable (sha256 + hex arithmetic exist
    everywhere), unlike ``rand()`` or engine-native ``hash()``; the DuckDB
    oracles rebuild the identical value nibble-by-nibble."""
    h = F.sha2(F.concat_ws("|", F.lit(salt), key.cast("string")), 256)
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long")


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      strat_col: str = "lang", key_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "samp") -> DataFrame:
    """Deterministic per-stratum sampling decision for every row.

    Keep iff ``uniform16(key) < floor(rate[stratum] * 65536)`` — integer
    thresholds, so the decision is bit-exact across engines and re-runs (the
    reproducibility contract: the same corpus + salt always yields the same
    sample, and raising a stratum's rate only ADDS docs, never swaps them).
    Rows whose stratum has no configured rate use ``default_rate``.
    """
    u = uniform16(F.col(key_col), salt).alias("u16")
    thresh = F.lit(int(default_rate * 65536))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(F.col(strat_col) == stratum, F.lit(int(rate * 65536))) \
                  .otherwise(thresh)
    return docs.select(
        key_col, strat_col, u, (F.col("u16") < thresh).alias("keep")
    )


def domain_quota_cap(docs: DataFrame, cap: int,
                     domain_col: str = "source",
                     key_col: str = "doc_id") -> DataFrame:
    """Keep at most ``cap`` documents per domain — the C4/RefinedWeb-style
    hot-domain guard (public method: per-host caps in Raffel et al. 2020
    §2.2, Penedo et al. 2023): without it a handful of mega-domains
    dominate the training mixture.

    The draw is pseudo-uniform and deterministic: per domain, the ``cap``
    docs with the smallest ``sha256(key)`` win (data-independent order —
    the same reproducibility contract as :func:`stratified_sample`, and
    re-running on a grown corpus only swaps docs whose hash displaces a
    prior winner). Returns the survivors with their ``draw_rank``.

    100 TB shape: ``row_number ≤ cap`` over (domain) is rewritten by
    Spark's WindowGroupLimit — each map partition pre-truncates to its
    local top-``cap`` per domain BEFORE the exchange, so a mega-domain
    ships O(cap · maps) rows, never its whole contents, and the per-domain
    sort after the shuffle is over ≤ cap·maps rows (this rank-limited form
    is the safe way to window over a skewed key; a bare window is not).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.sha2(F.col(key_col).cast("string"), 256), F.col(key_col))
    return (
        docs.withColumn("draw_rank", F.row_number().over(w))
        .where(F.col("draw_rank") <= cap)
    )


def domain_mixture(docs: DataFrame, weights: dict[str, float],
                   domain_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Per-domain token census + repeat factors for a target mixture.

    For each domain: its token count, natural share of the corpus, the target
    share implied by ``weights``, and ``repeat_factor`` — how many epochs of
    that domain a sampler should draw so the mixture matches the target
    (the DoReMi/Pile-style mixture-planning table).

    The unpartitioned window at the end runs over ONE row per domain — the
    post-aggregate table is tiny regardless of corpus size, so the
    single-partition total is free.
    """
    total_weight = sum(weights.values())
    target = F.lit(None).cast("double")
    for dom, wgt in sorted(weights.items()):
        target = F.when(F.col(domain_col) == dom,
                        F.lit(round(wgt / total_weight, 6))).otherwise(target)
    per_dom = (
        docs.select(F.col(domain_col), llm_token_estimate(F.col(text_col)).alias("est"))
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("est").cast("long").alias("domain_tokens"))
    )
    everything = Window.partitionBy()
    total = F.sum("domain_tokens").over(everything)
    return per_dom.select(
        F.col(domain_col),
        F.col("n_docs"),
        F.col("domain_tokens"),
        F.round(F.col("domain_tokens") / total, 6).alias("natural_share"),
        target.alias("target_share"),
        F.round(target * total / F.col("domain_tokens"), 4).alias("repeat_factor"),
    )


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Scrub PII patterns in order; count each type as actually replaced.

    Counts are taken on the PROGRESSIVELY redacted text (e.g. digits inside
    an already-replaced e-mail can't be double-counted as a phone), so
    ``n_<type>`` equals the number of ``<TYPE>`` tokens inserted. Returns
    (id, redacted, n_email, n_ssn, n_phone, n_ipv4) — a narrow per-row
    projection, no shuffle, whole-stage-codegen friendly.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(F.col(id_col), cur.alias("redacted"), *counts)


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunking (the RAG/embedding-prep shape).

    Whitespace tokens, windows of ``chunk_tokens`` advancing by
    ``chunk_tokens - overlap``; the final partial window is kept (standard
    chunker behavior — trailing text must land somewhere). Output:
    (id, chunk_id, n_chunk_tokens, chunk_text). Pure array expressions —
    one narrow projection + explode, no shuffle at all; chunk ids are
    per-document, so downstream embedding is embarrassingly parallel.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toked = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    ).where(F.size("toks") > 0)
    # last start must bring ≥1 NEW token (beyond the previous chunk's
    # overlap), else the tail chunk would be fully contained in its
    # predecessor: starts run to size - overlap - 1.
    last_start = F.greatest(F.size("toks") - overlap - 1, F.lit(0))
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.slice(F.col("toks"), s + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    exploded = toked.select("id", F.explode(chunks).alias("c"))
    return exploded.select(
        F.col("id").alias(id_col),
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.ctoks").cast("long").alias("n_chunk_tokens"),
        F.array_join("c.ctoks", " ").alias("chunk_text"),
    )


def repetition_metrics(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Within-document duplicate n-gram metrics (Gopher-style repetition).

    Per doc with ≥ n tokens: total n-grams, distinct n-grams, the duplicate
    fraction ``1 - distinct/total``, and the share of the single most-repeated
    n-gram. High values mark boilerplate/spam — the repetition quality gates.

    Shape: explode n-grams (narrow), one two-level hash aggregate keyed by
    (doc, shingle) then doc — partial aggregation does the heavy lifting
    map-side, identical to every shingle pipeline here.
    """
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col, distinct=False)
    per = sh.groupBy("id", "shingle").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_ngrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_ngrams"),
        F.max("cnt").cast("long").alias("max_repeat"),
    )
    total_d = F.col("n_ngrams").cast("double")
    return stats.select(
        F.col("id").alias(id_col),
        "n_ngrams",
        "n_distinct_ngrams",
        F.round(F.lit(1.0) - F.col("n_distinct_ngrams") / total_d, 6)
        .alias("dup_ngram_ratio"),
        F.round(F.col("max_repeat") / total_d, 6).alias("top_ngram_share"),
    )


def span_corrupt(docs: DataFrame, rate: float = 0.15,
                 salt: str = "t5span", id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4, public method):
    deterministically mask ~``rate`` of each document's tokens, collapse
    each contiguous masked run to a sentinel ``<Xk>`` in the encoder input,
    and emit the masked spans (prefixed by their sentinels) as the decoder
    target — the denoising training pair generator.

    Determinism: a token is masked iff ``uniform16(doc_id:pos, salt) <
    rate·65536`` (the engine's salted-sha256 draw — bit-exact cross-engine
    and reproducible across runs); runs and sentinel numbering follow from
    position order alone. Per-doc windows only (docs are bounded; the
    partition key is the high-cardinality doc id, so no hot reducer), one
    keyed aggregate to re-assemble the two strings.
    """
    from pyspark.sql.window import Window

    from hierarchical_graph_db_spark.functions.hashing import normalized_text
    from hierarchical_graph_db_spark.functions.text import tokens

    from hierarchical_graph_db_spark.operators.skew import fan_out_scan

    thr = int(rate * 65536)
    t = (
        # §2.5 single-split guard: the per-token salted-sha256 draw below is
        # the expensive stage — don't run it on one scan task (no-op on
        # multi-split scans).
        fan_out_scan(docs).select(
            F.col(id_col).alias("id"),
            tokens(normalized_text(F.col(text_col))).alias("toks"))
        .select("id", F.posexplode("toks").alias("pos", "tok"))
    )
    masked = uniform16(
        F.concat_ws(":", F.col("id"), F.col("pos")), salt) < thr
    w = Window.partitionBy("id").orderBy("pos")
    t = t.withColumn("masked", masked)
    # materialize the window results as plain columns BEFORE the aggregate
    # (window functions are not allowed inside aggregate expressions)
    t = t.withColumn(
        "run_start",
        F.col("masked") & ~F.coalesce(F.lag("masked").over(w), F.lit(False)))
    t = t.withColumn("k", F.sum(F.col("run_start").cast("int")).over(w))
    sent = F.concat(F.lit("<X"), (F.col("k") - 1).cast("string"), F.lit(">"))
    piece_in = (
        F.when(~F.col("masked"), F.col("tok"))
        .when(F.col("run_start"), sent)  # a run collapses to its sentinel
    )
    piece_tgt = F.when(
        F.col("masked"),
        F.when(F.col("run_start"), F.concat(sent, F.lit(" "), F.col("tok")))
        .otherwise(F.col("tok")))
    t = t.withColumn("p_in", piece_in).withColumn("p_tgt", piece_tgt)
    joined = lambda name: F.array_join(F.transform(F.filter(  # noqa: E731
        F.array_sort(F.collect_list(F.struct("pos", F.col(name).alias("p")))),
        lambda s: s["p"].isNotNull()), lambda s: s["p"]), " ")
    return (
        t.groupBy("id")
        .agg(joined("p_in").alias("inputs"),
             joined("p_tgt").alias("targets"))
        .select(F.col("id").alias(id_col), "inputs", "targets")
    )


def temperature_mixture(docs: DataFrame, alpha: float = 0.3,
                        domain_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Temperature-scaled sampling mixture (XLM-R / mT5 multilingual
    recipe, Conneau et al. 2020, public method): sampling share
    pᵢ ∝ tokensᵢ^α — α < 1 up-samples low-resource domains without a
    hand-tuned weight table (the data-driven complement to
    :func:`domain_mixture`'s explicit targets).

    Determinism: the pow() outputs are quantized to 1e-6 fixed-point
    bigints BEFORE normalization, so the share denominator is an exact
    integer sum (a plain double Σ over the per-domain rows would be
    partial-order-dependent); the final divisions round to 6dp/4dp. The
    per-domain table is one row per domain — every window/total is free
    at any corpus scale."""
    per_dom = (
        docs.select(F.col(domain_col),
                    llm_token_estimate(F.col(text_col)).alias("est"))
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("est").cast("long").alias("domain_tokens"))
    )
    wq = F.round(F.pow(F.col("domain_tokens").cast("double"),
                       F.lit(alpha)) * 1000000).cast("bigint")
    everything = Window.partitionBy()
    scored = per_dom.withColumn("_wq", wq)
    tok_total = F.sum("domain_tokens").over(everything).cast("double")
    w_total = F.sum("_wq").over(everything).cast("double")
    share = F.col("_wq") / w_total
    return scored.select(
        F.col(domain_col),
        F.col("n_docs"),
        F.col("domain_tokens"),
        F.round(F.col("domain_tokens") / tok_total, 6).alias("natural_share"),
        F.round(share, 6).alias("temp_share"),
        F.round(share * tok_total / F.col("domain_tokens"), 4)
        .alias("repeat_factor"),
    )
