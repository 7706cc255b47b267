"""Fuzzy / near-duplicate detection families (north-star, SURVEY.md §2.11).

Four detectors over a text corpus, all pure DataFrame ops:

* exact        — sha256 fingerprint groupBy (functions/hashing.py).
* n-gram Jaccard — shingle inverted index self-join; exact Jaccard on
                   candidate pairs (pairs sharing ≥1 shingle).
* MinHash+LSH  — shingle → per-seed min-hash → banded bucket join; candidate
                   pairs without the quadratic join.
* SimHash      — 64-bit sign-aggregated token hashes; near-dups = same band
                   prefix (Hamming-bucketed).

Hashes are sha256-hex substrings compared lexicographically — deterministic
and reproducible in ANSI SQL (the DuckDB oracles build identical strings),
unlike engine-native ``xxhash64``/``hash`` which differ across engines.

Scale: the shingle inverted index is the classic web-dedup layout — explode
shingles (narrow), shuffle once on shingle, self-join within shingle groups.
Hot shingles (stopword trigrams) are the skew risk: ``max_shingle_freq``
drops shingles seen in more than N docs (they carry no discriminative signal)
— this is the salting-equivalent lever at 100 TB.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.materialize import materialize

from hierarchical_graph_db_spark.functions.hashing import fingerprint, normalized_text
from hierarchical_graph_db_spark.functions.text import tokens

#: Version of the (id, band, band_key) index row layout itself.
LSH_INDEX_SCHEMA_VERSION = 1

#: Identifies the text-normalization + hash recipe baked into the band keys:
#: ``normalized_text`` (trim/lower/whitespace-collapse) → whitespace word
#: tokens → word n-gram shingles → sha256-chunk minhash family
#: (:func:`_minhash_wide`). Bump ONLY when any of those change — two
#: indexes with different tags have structurally identical band tables
#: whose key values never collide (the silent zero-duplicate failure mode).
LSH_NORMALIZATION_TAG = "normtext-ws-tokens/sha256-chunk-minhash-v1"


def lsh_index_manifest(n: int = 3, n_hashes: int = 16,
                       bands: int = 4) -> dict:
    """The parameter manifest a persisted LSH index carries alongside its
    data files (VERDICT r10 next-round #2): everything the probe side must
    agree on, written ONCE at build time so per-batch validation is an O(1)
    dict comparison instead of a whole-index column scan. Write it with
    :func:`hierarchical_graph_db_spark.io.write_lsh_index`; validate with
    :func:`validate_lsh_manifest`."""
    return {
        "schema_version": LSH_INDEX_SCHEMA_VERSION,
        "n": n,
        "n_hashes": n_hashes,
        "bands": bands,
        "normalization": LSH_NORMALIZATION_TAG,
    }


def validate_lsh_manifest(manifest: dict, n: int, n_hashes: int,
                          bands: int) -> None:
    """O(1) probe-vs-index parameter check: compare the persisted manifest
    against the probe side's parameters and this build's recipe tag. Raises
    ``ValueError`` naming every disagreeing field. No Spark job — this is
    the happy-path replacement for the whole-index aggregate scan
    (:func:`_validate_lsh_index`, now the ``deep_check`` path)."""
    expected = lsh_index_manifest(n=n, n_hashes=n_hashes, bands=bands)
    mismatches = [
        f"{k}: index={manifest.get(k)!r} probe={v!r}"
        for k, v in expected.items()
        if manifest.get(k) != v
    ]
    if mismatches:
        raise ValueError(
            "LSH index manifest does not match the probe-side parameters "
            "(an index built with different parameters produces band keys "
            "that never collide — every batch doc would be silently "
            "reported non-duplicate): " + "; ".join(mismatches))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per fingerprint with keeper id + duplicate count.

    First-writer-wins generalization of A1: keeper = min id.
    """
    return (
        docs.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text", distinct: bool = True) -> DataFrame:
    """Word n-gram shingle set per doc → (id, shingle), distinct by default.

    Built with array expressions (transform over a position sequence) — one
    narrow projection + one explode, no joins, no shuffle until the caller
    aggregates. The SQL oracles build the identical shingle strings via a
    position self-join; results match because both are the same n-gram set.

    ``distinct=False`` keeps every occurrence (a multiset) — the form the
    within-document repetition metrics need, where duplicate n-grams ARE the
    signal rather than noise.
    """
    # Input-skew guard (guide §2.5): a single-file fixture scan would run
    # the whole tokenize+shingle+hash stage as ONE task; no-op when the
    # scan already has ≥ core-count partitions (the 100 TB shape).
    from hierarchical_graph_db_spark.operators.skew import fan_out_scan

    docs = fan_out_scan(docs)
    # Materialize the token array once per row; referencing the raw
    # tokenization expression inside the transform lambda would re-run the
    # regex split per element access (O(tokens²) regex work per doc).
    toked = docs.select(
        F.col(id_col).alias("id"),
        tokens(normalized_text(F.col(text_col))).alias("toks"),
    )
    exploded = toked.select(
        "id", F.explode(shingle_array_from_tokens(F.col("toks"), n)).alias("shingle"))
    return exploded.distinct() if distinct else exploded


def shingle_array_from_tokens(toks, n: int = 3):
    """Row-local word n-gram shingle ARRAY from a pre-materialized token
    array column (doc order, duplicates kept) — the expression form of
    :func:`shingles`, usable where a groupBy is unavailable (e.g. computing
    per-row signatures inside a stream). Pass an already-projected token
    array column, not the raw tokenization expression (see the comment in
    ``shingles``)."""
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def _prune_hot_shingles(sh: DataFrame, docs: DataFrame,
                        max_shingle_freq: int | str | None) -> DataFrame:
    """Shared hot-shingle guard: drop shingles whose document frequency
    exceeds the cutoff (``"auto"`` = greatest(1000, n_docs/100), folded into
    the plan as a broadcast 1-row scalar — no eager driver job). One hot
    stopword trigram otherwise makes a quadratic bucket in the inverted-index
    self-join; this is the salting-equivalent skew lever at 100 TB. The
    DuckDB oracles replay the identical df-cutoff filter."""
    if max_shingle_freq is None:
        return sh
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if max_shingle_freq == "auto":
        nd = docs.agg(F.count(F.lit(1)).alias("nd"))
        cutoff = F.greatest(F.lit(1000), F.floor(F.col("nd") / 100))
        freq = freq.crossJoin(F.broadcast(nd)).where(F.col("df") <= cutoff)
    else:
        if (not isinstance(max_shingle_freq, int)
                or isinstance(max_shingle_freq, bool)
                or max_shingle_freq < 1):
            # a typo'd mode string ("aut0", "auto_cap" reaching here
            # unresolved, ...) would otherwise become a silent df<=string
            # comparison — corrupt pruning, no error
            raise ValueError(
                f"max_shingle_freq must be a positive int, None, or a "
                f"recognized mode string, got {max_shingle_freq!r}")
        freq = freq.where(F.col("df") <= F.lit(max_shingle_freq))
    return sh.join(freq, on="shingle").select("id", "shingle")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    max_shingle_freq: int | str | None = "auto",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_set_size: int = 0,
) -> DataFrame:
    """Exact Jaccard over shingle sets for pairs sharing ≥1 shingle.

    |A∩B| from the inverted-index self-join; |A|,|B| from per-doc counts;
    J = common / (|A|+|B|-common). ``max_shingle_freq`` prunes stop-shingles
    (skew + noise control at scale — ONE hot stopword trigram otherwise makes
    a quadratic bucket in the self-join). The guard defaults ON: ``"auto"``
    derives the cutoff as max(1000, 1% of the input docs) — a no-op on
    small corpora while capping any bucket's pair blowup at (0.01·|docs|)²
    at scale. The auto cutoff is computed INSIDE the plan (a broadcast 1-row
    count over the input, no eager driver-side job, no extra shuffle over
    the shingle table), and the DuckDB oracles replay the same df-cutoff
    filter, so the hash check holds even on a corpus where the guard binds.
    ``None`` disables (pure-Jaccard mode).

    ``min_set_size`` (with an aggressive absolute ``max_shingle_freq``):
    Jaccard over heavily pruned sets is noisy — two docs whose retained
    sets shrink to a handful of rare shingles can spuriously clear the
    threshold. Pairs where either side's retained set is smaller than
    ``min_set_size`` abstain (are not emitted); 0 disables.
    """
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    sh = _prune_hot_shingles(sh, docs, max_shingle_freq)
    # The shingle table feeds three plan subtrees (sizes + both self-join
    # sides); without materialization Spark recomputes the tokenize/shingle
    # projection three times — at corpus scale that triples the scan.
    sh = sh.transform(materialize)
    return _jaccard_pairs_from_shingles(sh, threshold, min_set_size)


def _jaccard_pairs_from_shingles(sh: DataFrame, threshold: float,
                                 min_set_size: int = 0) -> DataFrame:
    """The inverted-index count-aggregate Jaccard core over a (pre-pruned,
    pre-materialized) ``(id, shingle)`` table: self-join on shingle →
    per-pair ``count`` (map-side partials collapse duplicate keys before
    the exchange — the matched stream is small fixed-width rows, never
    arrays) → sizes join → exact J. Shared by :func:`ngram_jaccard_pairs`
    and :func:`prefix_filter_jaccard_pairs`' ``plan="index"`` strategy."""
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a")
                    .withColumnRenamed("n_shingles", "size_a"), on="id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_shingles", "size_b"), on="id_b")
        .withColumn(
            "_j",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        # Filter on the UNROUNDED ratio (the SQL oracles do the same); only
        # the output column is rounded — else a pair just under the threshold
        # that rounds up would flip the differential check.
        .where(F.col("_j") >= threshold)
        .where((F.least("size_a", "size_b") >= F.lit(min_set_size))
               if min_set_size else F.lit(True))
        .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
    )


def _minhash_wide(docs: DataFrame, n_hashes: int, n: int,
                  id_col: str, text_col: str,
                  sh: DataFrame | None = None) -> DataFrame:
    """Wide MinHash signatures: one row per doc, columns m0..m{n_hashes-1}.

    Hash family: chunking a sha256 digest — hash *i* of a shingle is the
    8-hex-char window ``substr(sha256((i//8)||'#'||shingle), (i%8)*8+1, 8)``,
    so 16 hash functions cost 2 sha256 calls (not 16). The per-doc min is a
    plain column agg → map-side partial aggregation collapses the shingle
    rows before the shuffle (only |docs| rows move, not |shingles|×seeds —
    the difference between 5k and 4M shuffled rows here, and between 100 GB
    and 80 TB at full scale).

    ``sh``: an already-built ``(id, shingle)`` table for ``docs`` (the
    :func:`shingles` output, possibly materialized) — callers that also
    need the shingle sets themselves pass it so the tokenize+shingle
    explode runs once, not once per consumer (round 15).
    """
    assert n_hashes % 8 == 0
    if sh is None:
        sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    srcs = [
        F.sha2(F.concat(F.lit(f"{s}#"), F.col("shingle")), 256)
        for s in range(n_hashes // 8)
    ]
    hashed = sh.select(
        "id",
        *[
            F.substring(srcs[i // 8], (i % 8) * 8 + 1, 8).alias(f"h{i}")
            for i in range(n_hashes)
        ],
    )
    return hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(n_hashes)]
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = 16, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Long-form MinHash signatures (id, seed, minhash) — unpivot of the wide
    form (kept for inspection/tests; the LSH path uses the wide form)."""
    wide = _minhash_wide(docs, n_hashes, n, id_col, text_col)
    pairs = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("seed"), F.col(f"m{i}").alias("minhash"))
            for i in range(n_hashes)
        ])
    ).alias("p")
    return wide.select("id", pairs).select(
        "id", F.col("p.seed").alias("seed"), F.col("p.minhash").alias("minhash")
    )


def lsh_band_table(docs: DataFrame, n_hashes: int = 16, bands: int = 4,
                   n: int = 3, id_col: str = "doc_id",
                   text_col: str = "text",
                   sh: DataFrame | None = None) -> DataFrame:
    """The MinHash-LSH signature index rows: (id, band, band_key), one row
    per doc per band — the table a bulk dedup PERSISTS and an incremental
    ingest PROBES (band_key = '|'-joined minhashes of that band's rows).
    Shared by the self-join candidate path (:func:`minhash_lsh_candidates`)
    and the index-probe path (:func:`incremental_minhash_dedup`) so both
    produce byte-identical keys."""
    rows_per_band = n_hashes // bands
    wide = _minhash_wide(docs, n_hashes, n, id_col, text_col, sh=sh)
    return wide.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "|",
                        *[F.col(f"m{b * rows_per_band + r}")
                          for r in range(rows_per_band)],
                    ).alias("band_key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"),
             F.col("bk.band_key").alias("band_key"))


def _validate_lsh_schema(index: DataFrame) -> None:
    """No-job check: the (id, band, band_key) columns must exist."""
    missing = {"id", "band", "band_key"} - set(index.columns)
    if missing:
        raise ValueError(
            f"LSH index is missing column(s) {sorted(missing)}; expected the "
            "(id, band, band_key) table produced by lsh_band_table()")


def _validate_lsh_index(index: DataFrame, n_hashes: int, bands: int,
                        existing: DataFrame | None = None,
                        n: int | None = None,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> None:
    """DEEP content check that a persisted LSH index matches the probe
    side's parameters (ADVICE r8/r9): a mismatched index makes the
    sha-derived band keys never collide, so every batch doc would be
    silently reported non-duplicate. Since round 11 this is the
    ``deep_check=True`` / no-manifest FALLBACK path of
    :func:`incremental_minhash_dedup` — the happy path validates the O(1)
    build-time manifest instead (:func:`validate_lsh_manifest`), because
    this function's aggregate is a full single-column scan of a
    corpus-sized table per batch (the round-10 always-on form contradicted
    the operator's own O(|batch|·bands) contract, VERDICT r10 #2). Checks:

    * schema: the (id, band, band_key) columns must exist (no job);
    * band range + rows-per-band, ONE aggregate pass: ``max(band)`` must be
      ``bands - 1`` and ``min/max(size(split(band_key,'|')))`` must both be
      ``n_hashes // bands``. The min/max over the WHOLE index (not a
      LIMIT-1 sample, ADVICE r9) also catches a heterogeneous index — e.g.
      two appended generations built with different ``n_hashes`` — that a
      sampled row would miss;
    * ``n`` / text-normalization mismatch (ADVICE r9): an index built with
      a different shingle size has an IDENTICAL (band, band_key) shape but
      disjoint key values — the silent zero-duplicate mode the shape checks
      can't see. When ``existing`` and ``n`` are given, recompute ONE
      existing doc's band keys with the probe-side parameters and require
      at least one to appear in the index (an equality filter the parquet
      scan pushes down). The sampled doc is drawn from docs whose id IS in
      the index (semi-join before the limit) — an index that legitimately
      LAGS the corpus (docs appended since the last index refresh, the
      natural continuous-ingest cadence) must not trip this check
      (ADVICE r10). Skipped when no existing doc appears in the index or
      the sampled doc yields no shingles (text shorter than ``n``).

    An empty index (fresh corpus) passes — there is nothing to mismatch.
    """
    _validate_lsh_schema(index)
    probe_rows = n_hashes // bands
    stats = index.select(
        F.max("band").alias("mb"),
        F.min(F.size(F.split("band_key", "[|]"))).alias("lo"),
        F.max(F.size(F.split("band_key", "[|]"))).alias("hi"),
    ).first()
    if stats["mb"] is None:
        return
    if stats["mb"] != bands - 1:
        raise ValueError(
            f"LSH index max(band) == {stats['mb']} but the probe side "
            f"expects {bands - 1} (bands={bands}): index and probe "
            "parameters disagree")
    if stats["lo"] != probe_rows or stats["hi"] != probe_rows:
        raise ValueError(
            f"LSH index band_key joins {stats['lo']}..{stats['hi']} minhashes "
            f"per band but the probe side expects {probe_rows} "
            f"(n_hashes={n_hashes} / bands={bands}): index and probe "
            "parameters disagree (a min≠max range means a heterogeneous "
            "index — generations built with different parameters)")
    if existing is not None and n is not None:
        # Sample a doc whose id the index actually contains: an index that
        # lags the corpus (fresh docs not yet indexed) must not trip a
        # parameter-mismatch error (ADVICE r10). The semi-join keeps the
        # sample deterministic in WHAT it proves even though WHICH doc is
        # sampled is unordered: any indexed doc's recomputed band keys must
        # appear in the index when parameters agree.
        sample = (
            existing.select(F.col(id_col), F.col(text_col))
            .join(index.select(F.col("id").alias(id_col)).distinct(),
                  on=id_col, how="leftsemi")
            .limit(1)
        )
        keys = [r["band_key"] for r in lsh_band_table(
            sample, n_hashes=n_hashes, bands=bands, n=n,
            id_col=id_col, text_col=text_col,
        ).select("band_key").collect()]
        if keys and index.where(
                F.col("band_key").isin(keys)).limit(1).count() == 0:
            raise ValueError(
                "LSH index does not contain any band key recomputed (with "
                f"the probe-side parameters n={n}, n_hashes={n_hashes}, "
                f"bands={bands}) from a doc the index itself covers: the "
                "index was built with a different shingle size or text "
                "normalization")


def incremental_minhash_dedup(
    existing: DataFrame,
    new: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
    index_manifest: dict | str | None = None,
    deep_check: bool = False,
) -> DataFrame:
    """Incremental fuzzy-dedup maintenance: dedup a NEW batch against an
    EXISTING corpus by probing the corpus's LSH signature index — the
    continuous-ingest form of fuzzy dedup (the reference's dedup-upsert
    sink — ``app/agents/parsing_agent.py:67`` ``upsert_email`` — lifted
    from exact content-hash to near-duplicate matching).

    Scale shape — per-batch cost is O(|batch|·bands) plus matched
    candidates, never a corpus rescan:

    * the index side is the (id, band, band_key) table the initial bulk
      dedup PERSISTS, bucketed by (band, band_key). Pass it as ``index``
      (e.g. ``spark.table("lsh_index")`` over a ``bucketBy(N, "band",
      "band_key")`` table — then the probe join leaves the index side
      exchange-free, pinned in ``tests/test_storage_layout.py``); when
      ``index`` is None it is recomputed from ``existing``, which produces
      byte-identical keys (same :func:`lsh_band_table`);
    * candidates = probe ⋈ index on (band, band_key) — only new×existing
      pairs, no self-join of the corpus;
    * verification fetches shingle sets ONLY for docs that appear in a
      candidate pair (semi-join pruned), then exact distinct-shingle
      Jaccard, row-local.

    Output: one row per NEW doc — (id_col, dup_of, best_jaccard,
    is_duplicate); ``dup_of`` = MIN existing id among verified matches
    (J ≥ threshold), ``best_jaccard`` = MAX matching score (6 dp), both
    NULL (is_duplicate false) for batch docs with no match.

    Index validation (round 11, VERDICT r10 #2): pass ``index_manifest``
    (the dict from :func:`lsh_index_manifest`, or the path of the
    ``_lsh_manifest.json`` sidecar ``io.write_lsh_index`` writes) and the
    happy path validates parameters by O(1) comparison — NO Spark job over
    the index, preserving the O(|batch|·bands) per-batch contract. With an
    ``index`` but no manifest, the deep content check runs as a fallback
    (one full index-column scan + a one-doc band-key recompute,
    :func:`_validate_lsh_index`) with a warning — correct but a standing
    per-batch tax at corpus scale. ``deep_check=True`` forces the content
    check IN ADDITION to any manifest (the audit path: a manifest asserts
    what the builder intended; the deep check proves what the files
    contain).
    """
    if index is not None:
        if isinstance(index_manifest, str):
            import json

            with open(index_manifest) as fh:
                index_manifest = json.load(fh)
        if index_manifest is not None:
            _validate_lsh_schema(index)
            validate_lsh_manifest(index_manifest, n=n, n_hashes=n_hashes,
                                  bands=bands)
            if deep_check:
                _validate_lsh_index(index, n_hashes=n_hashes, bands=bands,
                                    existing=existing, n=n,
                                    id_col=id_col, text_col=text_col)
        else:
            warnings.warn(
                "probing a persisted LSH index without an index_manifest: "
                "falling back to the deep content check, a full scan of "
                "the index's band_key column per batch — write the index "
                "with io.write_lsh_index (or pass lsh_index_manifest(...)) "
                "to make validation O(1)",
                RuntimeWarning, stacklevel=2)
            _validate_lsh_index(index, n_hashes=n_hashes, bands=bands,
                                existing=existing, n=n,
                                id_col=id_col, text_col=text_col)
    # Both shingle tables stay RECOMPUTED projections (measured round 15:
    # materializing either side is a net loss here — the existing side is
    # corpus-sized, where re-reading column-pruned parquet beats an
    # executor-storage checkpoint at the 100 TB shape, and even the bounded
    # batch side's eager checkpoint job cost more than the one recompute it
    # saved, 2.7 vs 2.3 s warm at sf0.1). A real deployment passes the
    # PERSISTED ``index``, which skips the existing-side band pass
    # entirely.
    idx = index if index is not None else lsh_band_table(
        existing, n_hashes=n_hashes, bands=bands, n=n,
        id_col=id_col, text_col=text_col)
    sh_e = shingles(existing, n=n, id_col=id_col, text_col=text_col)
    sh_n = shingles(new, n=n, id_col=id_col, text_col=text_col)
    probe = lsh_band_table(new, n_hashes=n_hashes, bands=bands, n=n,
                           id_col=id_col, text_col=text_col, sh=sh_n)
    cand = (
        probe.select(F.col("id").alias("nid"), "band", "band_key")
        .join(idx.select(F.col("id").alias("eid"), "band", "band_key"),
              on=["band", "band_key"])
        .select("nid", "eid")
        .distinct()
    )
    sets_n = (
        sh_n
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("shingle")).alias("sn"))
        .select(F.col("id").alias("nid"), "sn")
    )
    # Existing-side shingle sets only for candidate ids: the semi-join IS
    # the "point-read the matched docs" step of a real index probe.
    sets_e = (
        sh_e
        .join(cand.select(F.col("eid").alias("id")).distinct(), on="id",
              how="leftsemi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("shingle")).alias("se"))
        .select(F.col("id").alias("eid"), "se")
    )
    j = (F.size(F.array_intersect("sn", "se"))
         / (F.size("sn") + F.size("se")
            - F.size(F.array_intersect("sn", "se"))))
    matched = (
        cand.join(sets_n, on="nid").join(sets_e, on="eid")
        .withColumn("_j", j)
        .where(F.col("_j") >= threshold)
    )
    per_new = matched.groupBy("nid").agg(
        F.min("eid").alias("dup_of"),
        F.round(F.max("_j"), 6).alias("best_jaccard"),
    )
    return (
        new.select(F.col(id_col).alias("nid"))
        .join(per_new, on="nid", how="left")
        .select(
            F.col("nid").alias(id_col),
            "dup_of",
            "best_jaccard",
            F.col("dup_of").isNotNull().alias("is_duplicate"),
        )
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH banding: docs agreeing on *all* rows of ≥1 band become candidates.

    band_key = concat of that band's minhashes; candidates = equi-self-join on
    (band, band_key) — linear in corpus size + bucket-local pairing, the
    100 TB-safe shape (no all-pairs join anywhere).
    """
    banded = lsh_band_table(docs, n_hashes=n_hashes, bands=bands, n=n,
                            id_col=id_col, text_col=text_col)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash_fingerprints(docs: DataFrame, n_bits: int = 64,
                         id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash: per-token sha256 → bit votes → sign → n_bits-char '0'/'1' string.

    Token hash bit b comes from hex digit ``b//4`` of the sha256 (bit
    ``3-b%4``), decoded arithmetically (strpos on a hex alphabet) so the
    identical computation exists in the SQL oracle. Input fans out through
    the §2.5 single-split guard before the per-token hash stage (no-op on
    multi-split scans).

    Plan shape: the bit votes are ``n_bits`` WIDE sum aggregates over the
    token rows (one ±1 expression per bit, hex digits decoded once per
    token), not a tokens×n_bits row explode — the explode form moved 64×
    the token count through the vote shuffle and was the second-largest
    absolute cost of the sf1 sweep (52 s; this shape ~3× less wall).
    Map-side partials collapse each partition to |docs| rows before the
    exchange. Values are bit-identical to the long form: same per-token
    ±1 votes, same per-bit integer sums, same ``vote >= 0`` sign rule.
    """
    from hierarchical_graph_db_spark.operators.skew import fan_out_scan

    toks = (
        fan_out_scan(docs).select(
            F.col(id_col).alias("id"),
            F.explode(tokens(normalized_text(F.col(text_col)))).alias("tok"),
        )
        .withColumn("th", F.substring(F.sha2(F.col("tok"), 256), 1, n_bits // 4))
    )
    # hex digit k (0-15) decoded once, shared by its 4 bits
    digits = toks.select(
        "id",
        *[
            (F.instr(F.lit("0123456789abcdef"),
                     F.substring(F.col("th"), k + 1, 1)) - 1).alias(f"d{k}")
            for k in range(n_bits // 4)
        ],
    )
    votes = [
        F.sum(
            F.when(
                (F.floor(F.col(f"d{b // 4}") / F.lit(2 ** (3 - b % 4))) % 2)
                == 1, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(n_bits)
    ]
    wide = digits.groupBy("id").agg(*votes)
    return wide.select(
        "id",
        F.concat(*[
            F.when(F.col(f"v{b}") >= 0, "1").otherwise("0")
            for b in range(n_bits)
        ]).alias("simhash"),
    )


def simhash_band_candidates(docs: DataFrame, n_bits: int = 64, bands: int = 4,
                            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hamming-bucketed SimHash candidates: pairs equal on ≥1 of ``bands``
    contiguous bit-bands (catches pairs within ~bands-1 bit flips)."""
    width = n_bits // bands
    fp = simhash_fingerprints(docs, n_bits=n_bits, id_col=id_col, text_col=text_col)
    banded = fp.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"),
                         F.substring("simhash", i * width + 1, width).alias("key"))
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — public method, token-gram granularity)
# ---------------------------------------------------------------------------

def positioned_shingles(docs: DataFrame, n: int, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, pos, shingle): every word n-gram occurrence WITH its start token
    position — the positional twin of :func:`shingles` (which collapses to a
    set). One narrow projection + one explode; no shuffle."""
    toked = docs.select(
        F.col(id_col).alias("id"),
        tokens(normalized_text(F.col(text_col))).alias("toks"),
    )
    toks = F.col("toks")
    sh = F.when(
        F.size(toks) < n,
        F.array().cast("array<struct<pos:int,shingle:string>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.concat_ws(" ", *[
                    F.element_at(toks, (i + j + 1).cast("int"))
                    for j in range(n)
                ]).alias("shingle"),
            ),
        )
    )
    return (
        toked.select("id", F.explode(sh).alias("s"))
        .select("id", F.col("s.pos").alias("pos"),
                F.col("s.shingle").alias("shingle"))
    )


def duplicate_spans(docs: DataFrame, n: int = 6, min_occ: int = 2,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """ExactSubstr-style dedup at token-gram granularity: per document, the
    maximal token spans covered by word ``n``-grams that occur ≥ ``min_occ``
    times ANYWHERE in the corpus (other docs or repeats within the same doc
    — Lee et al. count any second occurrence). Returns one row per doc:
    (doc_id, n_tokens, n_dup_spans, dup_tokens, dup_fraction 6dp) — docs
    shorter than ``n`` tokens report zero spans.

    Scale shape (the suffix-array of the paper re-expressed relationally):

    1. positioned n-gram occurrences — narrow explode, no shuffle;
    2. global occurrence count per shingle string — ONE hash aggregate,
       partials collapse map-side (the count side is one row per distinct
       shingle, so a stopword mega-shingle is 1 row there);
    3. occurrences ⋈ duplicated shingles — shuffle hash join keyed on the
       shingle (AQE skew-split handles hot shingles; at 100 TB the join key
       would be a 128-bit shingle hash to cut shuffle width — kept as the
       raw string here for exact oracle parity);
    4. span merge — per-doc gaps-and-islands over start positions (two
       spans merge iff ``pos - prev_pos ≤ n``, i.e. overlap or adjacency;
       with fixed-length intervals sorted by start, the running max end IS
       the previous end, so a single ``lag`` suffices): windows partition by
       doc — document-sized state, no global sort.
    """
    occ = positioned_shingles(docs, n, id_col, text_col)
    dup = (
        occ.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= min_occ)
        .select("shingle")
    )
    marked = occ.join(dup, on="shingle").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    islands = (
        marked.withColumn(
            "new_island",
            F.when(F.col("pos") - F.lag("pos").over(w) <= n, 0).otherwise(1))
        .withColumn("island", F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    spans = (
        islands.groupBy("id", "island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + n - 1).alias("span_end"))
    )
    per_doc = (
        spans.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_spans"),
             F.sum(F.col("span_end") - F.col("span_start") + 1)
             .alias("dup_tokens"))
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(tokens(normalized_text(F.col(text_col))))
        .cast("bigint").alias("n_tokens"))
    return (
        base.join(per_doc, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint")
            .alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint")
            .alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) /
                F.greatest(F.col("n_tokens"), F.lit(1)), 6)
            .alias("dup_fraction"),
        )
    )


def sorted_neighborhood_pairs(docs: DataFrame, window: int = 4,
                              key_len: int = 16, prefix_len: int = 2,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995, public
    method): sort the corpus by a normalized key, compare each record only
    with its ``window - 1`` successors in sort order → candidate pairs
    scored by token-set Jaccard. The classic alternative to LSH blocking:
    O(n·w) comparisons, catches near-dups whose edits keep the sort-key
    prefix stable.

    Scale shape — the global sort rank WITHOUT a corpus-wide single
    partition: rows get a per-prefix ``row_number`` (windows partitioned by
    the ``prefix_len``-char key prefix — parallel), prefix group counts
    cumulate over the tiny aggregated prefix table only (bounded rows),
    and the broadcast offsets lift local ranks to the global total order
    (the same two-level parallel-prefix trick as the chunked EWMA).
    Neighbor pairs come from exploding j ∈ [1, w-1] and equi-joining
    ``rank + j = rank2`` — co-partitioned, never a range join. Jaccard is
    row-local set arithmetic on the pair row.

    Returns (doc1, doc2, dist, jaccard): pair ids in (id) order, sort-rank
    distance, 6-dp token-set Jaccard.
    """
    norm = F.trim(F.lower(F.col(text_col)))
    d = (
        docs.where(F.length(F.trim(text_col)) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.substring(norm, 1, key_len).alias("k"),
            F.array_distinct(F.split(norm, r"\s+")).alias("toks"),
        )
        .withColumn("pfx", F.substring("k", 1, prefix_len))
    )
    local = d.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("pfx").orderBy("k", "id")))
    counts = local.groupBy("pfx").agg(F.count(F.lit(1)).alias("c"))
    offsets = counts.withColumn(
        "off",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("pfx")
                .rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select("pfx", "off")
    ranked = (
        local.join(F.broadcast(offsets), "pfx")
        .select("id", "toks", (F.col("off") + F.col("rn")).alias("rnk"))
    )
    right = ranked.select(F.col("id").alias("id_b"),
                          F.col("toks").alias("toks_b"),
                          F.col("rnk").alias("rnk_b"))
    pairs = (
        ranked.select(
            "id", "toks", "rnk",
            F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("j"),
        )
        .withColumn("rnk_b", F.col("rnk") + F.col("j"))
        .join(right, "rnk_b")
    )
    jac = F.round(
        F.size(F.array_intersect("toks", "toks_b"))
        / F.size(F.array_union("toks", "toks_b")), 6)
    return pairs.select(
        F.least("id", "id_b").alias("doc1"),
        F.greatest("id", "id_b").alias("doc2"),
        F.col("j").alias("dist"),
        jac.alias("jaccard"),
    )


#: ``plan="auto"`` in :func:`prefix_filter_jaccard_pairs` picks the prefix
#: filter only when the shingle df distribution is head-heavy enough for
#: prefix pruning to beat the plain inverted index. Decision statistic
#: (measured round 11, tools/prefix_crossover_probe.py → PLANS.md
#: §Round-11): the HOT SHARE of the join volume,
#: ``Σ_{df > HOT_DF} df² / Σ df²`` — the fraction of the inverted-index
#: self-join's matched rows that hot shingles would carry. That is
#: exactly the volume frequency-ascending prefix ordering removes from
#: the join keys, so it directly prices the trade: pay the prefix
#: machinery (df join + per-doc rank window + per-candidate ARRAY
#: verification) only when it kills > half the join volume. Measured
#: (CROSSOVER_r11.json): TPC-H-ish documents (flat df, share 0.000 at
#: sf0.1 AND sf1) → index wins ~2× (20.8 vs 41.0 s at sf1); Heaps-Zipf
#: sf3 (share 0.646) → prefix wins 1.4× (28.7 vs 41.1 s); the heaps-sf1
#: boundary point (share 0.396) measured a statistical tie (10.5 vs
#: 10.6 s) — both sides of 0.5 are measured, and the boundary regime
#: costs nothing to mispredict.
PREFIX_PLAN_HOT_DF = 1_000
PREFIX_PLAN_HOT_SHARE = 0.5


def hot_share_stats(sh: DataFrame, hot_df: int) -> dict:
    """The ONE decision statistic behind both data-dependent plan picks
    (VERDICT r12 next-round #3 — shared so the two pickers can't drift):
    group the shingle table to document frequencies, then ONE 1-row
    aggregate (the bounded-collect class, same as the k-means codebook
    pulls) returning

    * ``share``    = Σ_{df > hot_df} df² / Σ df² — the fraction of the
      inverted-index self-join's matched-occurrence volume carried by hot
      shingles, i.e. exactly the volume a prefix ordering (or a df cap)
      removes from the join keys;
    * ``retained`` = Σ_{df ≤ hot_df} df / Σ df — the fraction of shingle
      OCCURRENCES a df cap keeps, the head-degeneracy detector (≈0 means
      a capped plan abstains on essentially everything).

    Callers and their measured caps/thresholds (side-by-side in PLANS.md
    §Round-13): :func:`_auto_prefix_plan` at ``hot_df=PREFIX_PLAN_HOT_DF``
    (1000, CROSSOVER_r11.json) and :func:`containment_pairs`
    ``"auto_cap"`` at ``hot_df=CONTAINMENT_CAP_DF`` (64,
    CONTAINMENT_CROSSOVER_r12.json), both picking the pruned plan above a
    0.5 share."""
    st = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.sum(F.col("df") * F.col("df")).alias("v"),
            F.sum(F.when(F.col("df") > hot_df,
                         F.col("df") * F.col("df")).otherwise(0)).alias("hv"),
            F.sum("df").alias("r"),
            F.sum(F.when(F.col("df") <= hot_df, F.col("df"))
                  .otherwise(0)).alias("rr"),
        )
        .first()
    )
    return {
        "share": (st["hv"] or 0) / max(st["v"] or 0, 1),
        "retained": (st["rr"] or 0) / max(st["r"] or 0, 1),
    }


def _auto_prefix_plan(sh: DataFrame) -> str:
    """The ``plan="auto"`` decision for :func:`prefix_filter_jaccard_pairs`:
    :func:`hot_share_stats` at the measured prefix crossover cap →
    "prefix" iff the hot-df share of Σdf² exceeds the measured crossover."""
    share = hot_share_stats(sh, PREFIX_PLAN_HOT_DF)["share"]
    return "prefix" if share > PREFIX_PLAN_HOT_SHARE else "index"


def prefix_filter_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                                n: int = 3, id_col: str = "doc_id",
                                text_col: str = "text",
                                plan: str = "auto") -> DataFrame:
    """Set-similarity join by PREFIX FILTERING (Chaudhuri et al. 2006 /
    PPJoin, Xiao et al. 2008 — public methods) over word-``n``-gram
    shingle sets: order each document's shingles by ascending global
    frequency and index only its first ``|s| - ceil(t·|s|) + 1``; any pair
    with Jaccard ≥ t MUST share a prefix shingle (if the overlap avoided
    A's prefix entirely it would fit in the ⌈t·|A|⌉−1 suffix slots,
    contradicting overlap ≥ ⌈t·|A|⌉ implied by J ≥ t), so candidates come
    from an equi-join on prefix shingles only and exact Jaccard verifies
    row-locally on the candidates' sorted shingle arrays.

    The principled alternative to :func:`ngram_jaccard_pairs`' hot-shingle
    cutoff: instead of DROPPING frequent shingles (removing them from the
    similarity math), frequency-ascending ordering pushes them to the
    suffix where they are never indexed — stop-shingles stop being join
    keys but still count toward Jaccard, so the score is the TRUE Jaccard.
    A shingle becomes a join key only when it lands in a prefix, which for
    hot shingles happens only in near-all-hot documents.

    Scale shape: shingle df is one hash aggregate; the rank window
    partitions per document (parallel); the candidate join keys on the
    prefix shingle; verification is row-local array intersection. The
    equivalence with the unfiltered all-pairs join (no false negatives) is
    pinned in tests/test_dedup_fuzzy.py. Returns (id_a, id_b, jaccard)
    with jaccard ≥ t at 6 dp.

    ``plan`` (round 11, VERDICT r10 next-round #1 — the measured
    crossover): the prefix filter's win is CONDITIONAL on a head-heavy
    shingle frequency distribution. On the Heaps-Zipf corpus it beat the
    plain inverted index (HEAPS_r9: 0.85× vs 1.06× the MinHash yardstick),
    but on the TPC-H-ish fixture — bounded vocabulary, df distribution
    flat-ish — it was ~2× SLOWER at sf1 (40 s vs ~20 s): with no rare
    head to move hot shingles behind, the prefix still indexes ~half of
    every document's occurrences while paying the df join, the per-doc
    rank window, and the per-candidate ARRAY verification the index plan
    never ships. Strategies:

    * ``"prefix"`` — always PPJoin (the high-skew mode);
    * ``"index"`` — always the plain inverted-index count-aggregate
      (:func:`_jaccard_pairs_from_shingles`, no df cutoff — TRUE Jaccard,
      identical output);
    * ``"auto"`` (default) — :func:`_auto_prefix_plan`: ONE cheap
      aggregate over the already-materialized shingle rows (1-row
      collect, the same bounded-collect class as the k-means codebooks)
      computes the hot-df share of Σdf² and picks prefix iff it exceeds
      ``PREFIX_PLAN_HOT_SHARE`` — i.e. when hot shingles would carry more
      than half the index join's matched volume, which is precisely the
      volume prefix ordering removes from the join keys.

    Both strategies return identical rows (pinned in
    tests/test_dedup_fuzzy.py::test_prefix_plan_strategies_agree); the
    DuckDB oracle is plan-independent."""
    if plan not in ("auto", "prefix", "index"):
        raise ValueError(f"plan must be auto|prefix|index, got {plan!r}")
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col) \
        .transform(materialize)   # feeds df, ranks, and both arrays
    if plan == "auto":
        plan = _auto_prefix_plan(sh)
    if plan == "index":
        return _jaccard_pairs_from_shingles(sh, threshold)
    dfq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rk = sh.join(dfq, "shingle").withColumn(
        "rnk", F.row_number().over(
            Window.partitionBy("id").orderBy("df", "shingle")))
    sz = sh.groupBy("id").agg(F.count(F.lit(1)).alias("s"))
    pfx = (
        rk.join(sz, "id")
        .where(F.col("rnk")
               <= F.col("s") - F.ceil(F.lit(threshold) * F.col("s")) + 1)
        .select("id", "shingle", "rnk", "s")
    )
    a, b = pfx.alias("a"), pfx.alias("b")
    # Two further PPJoin prunes, both output-preserving (Xiao et al. 2008
    # lemmas, public method), applied per prefix match BEFORE the distinct
    # so hot prefix shingles stop minting candidates:
    #   * LENGTH filter: J ≥ t ⇒ |a∩b| ≤ min(|a|,|b|) and |a∩b| ≥
    #     t·|a∪b| ≥ t·max(|a|,|b|) ⇒ min ≥ t·max;
    #   * POSITIONAL filter: the overlap reachable from a match at prefix
    #     positions (pa, pb) is ≤ min(sa−pa, sb−pb)+1, which must reach the
    #     required α = t/(1+t)·(sa+sb). For any true pair the SMALLEST
    #     common shingle in the global (df, shingle) order sits in both
    #     prefixes (given the length filter) and every common shingle ranks
    #     at or after it in both docs, so that match always passes — no
    #     false negatives (pinned in tests/test_dedup_fuzzy.py).
    # The 1e-9 slack absorbs float rounding in t·max and α so a borderline
    # integer-exact pair can never be dropped by IEEE noise.
    alpha = (F.lit(threshold / (1.0 + threshold))
             * (F.col("a.s") + F.col("b.s")) - F.lit(1e-9))
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id"))
               & (F.least(F.col("a.s"), F.col("b.s"))
                  >= F.lit(threshold) * F.greatest(F.col("a.s"), F.col("b.s"))
                  - F.lit(1e-9))
               & (F.least(F.col("a.s") - F.col("a.rnk"),
                          F.col("b.s") - F.col("b.rnk")) + 1 >= alpha))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = sh.groupBy("id").agg(
        F.sort_array(F.collect_set("shingle")).alias("sset"))
    sa = sets.select(F.col("id").alias("id_a"), F.col("sset").alias("ta"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("sset").alias("tb"))
    jac = (F.size(F.array_intersect("ta", "tb"))
           / F.size(F.array_union("ta", "tb")))
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("_j", jac)
        .where(F.col("_j") >= threshold)
        .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
    )


# --- Jaro-Winkler blocked linkage --------------------------------------------

def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity (Winkler 1990, public method), bit-parity
    with DuckDB's ``jaro_winkler_similarity`` (RapidFuzz semantics,
    verified exhaustively in ``tests/test_jaro_winkler.py``): either side
    empty → 0.0; the 0.1 prefix boost (≤4 chars) applies only when the
    Jaro score exceeds the 0.7 boost threshold; term order of the final
    arithmetic matches RapidFuzz so the IEEE doubles come out identical —
    which is what lets the oracle compare SCORES, not just pair sets."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        jaro = 1.0
    else:
        md = max(len(s1), len(s2)) // 2 - 1
        if md < 0:
            md = 0
        f1 = [False] * len(s1)
        f2 = [False] * len(s2)
        m = 0
        for i, c in enumerate(s1):
            for j in range(max(0, i - md), min(len(s2), i + md + 1)):
                if not f2[j] and s2[j] == c:
                    f1[i] = f2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(len(s1)):
            if f1[i]:
                while not f2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        jaro = (m / len(s1) + m / len(s2) + (m - t) / m) / 3
    if jaro <= 0.7:
        return jaro
    pl = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        pl += 1
    return jaro + pl * 0.1 * (1 - jaro)


def jaro_winkler_pairs(pairs: DataFrame, a_col: str, b_col: str,
                       threshold: float = 0.9,
                       out_col: str = "sim") -> DataFrame:
    """Score candidate string pairs with Jaro-Winkler and keep those at or
    above ``threshold``. The kernel is Python-per-pair INSIDE Arrow batches
    (``mapInPandas``) — JW's flag-array matching loop doesn't vectorize
    with numpy primitives, so this is the documented Python-kernel seam
    (same class as the reference's per-file parse loop); rows still move
    as Arrow columns, not pickled rows.

    The caller supplies the candidate pairs — blocking is the scale lever
    (block-local quadratic work, exactly the levenshtein-join discipline);
    for skew-prone blocking keys use :func:`sorted_neighborhood_pairs`
    instead of an equi-block."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema.fields)

    def score(batches):
        for pdf in batches:
            # Nulls arrive from Arrow as float NaN (truthy!) — treat any
            # non-string side as similarity 0.0 instead of crashing the batch.
            sims = [jaro_winkler(a, b)
                    if isinstance(a, str) and isinstance(b, str) else 0.0
                    for a, b in zip(pdf[a_col], pdf[b_col])]
            out = pdf.copy()
            out[out_col] = sims
            yield out[out[out_col] >= threshold]

    return (
        pairs.mapInPandas(score, f"{fields}, {out_col} double")
        .withColumn(out_col, F.round(out_col, 6))
    )


#: ``max_shingle_freq="auto_cap"`` in :func:`containment_pairs` picks the
#: FIXED df cap (the ``dedup_containment_capped`` scale contract) over the
#: N-complete ``"auto"`` cutoff when the head would dominate the join:
#: decision statistic = ``Σ_{df > CAP} df² / Σ df²`` — the exact share of
#: the inverted-index self-join's matched-occurrence volume that the cap
#: removes (same statistic family as the prefix ``plan="auto"`` pick,
#: CROSSOVER_r11.json). Above the crossover the complete plan's volume is
#: head-dominated — the regime where HEAPS_r9 measured the N-complete
#: cutoff running ~2× the linear MinHash yardstick across the sf1→sf10
#: decade — so the cap (linear bound Σ_{df≤c} df² ≤ c·R) wins; below it
#: the cap removes little volume, so exactness is kept for free. Measured
#: both sides in CONTAINMENT_CROSSOVER_r12.json (PLANS.md §Round-12).
CONTAINMENT_CAP_DF = 64
CONTAINMENT_CAP_SHARE = 0.5
#: min retained-set size enforced when auto_cap picks the capped regime —
#: C = |A∩B|/min(|A|,|B|) over a 2-3-shingle retained set trivially hits
#: 1.0, so capping without the guard manufactures false positives
#: (HEAPS_r9 lesson, same value as the dedup_containment_capped contract).
CONTAINMENT_CAP_MIN_SET = 20


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    max_shingle_freq: int | str | None = "auto",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_set_size: int = 0,
) -> DataFrame:
    """Asymmetric set-containment near-dups (Broder 1997's containment
    coefficient, public method): C = |A∩B| / min(|A|,|B|) ≥ threshold —
    catches SUBSUMPTION (one doc embedded in a much larger one), which
    Jaccard structurally misses: a 50-shingle doc fully contained in a
    5000-shingle doc has J ≈ 0.01 but C = 1.0. Same inverted-index
    candidate machinery and hot-shingle guard as
    :func:`ngram_jaccard_pairs`; both scores are reported so downstream
    keep/drop rules can distinguish duplicates (high J) from containments
    (high C, low J).

    Why this deliberately stays the plain inverted-index count-aggregate
    while :func:`prefix_filter_jaccard_pairs` uses PPJoin prefix filtering —
    a MEASURED negative result (round 8, sf1 = 50k docs):

    * containment has no LENGTH filter (any size ratio can reach C = 1)
      and its required overlap α = ⌈t·min(|A|,|B|)⌉ is PAIR-dependent, so
      no per-doc prefix can be cut from the index up front — the
      positional bound can only run inside the join condition;
    * measured: that per-pair positional filter cut the matched-occurrence
      stream 116M → 31M pairs, but exact verification then needs the two
      docs' shingle ARRAYS per candidate instead of this plan's single
      count-aggregate over small (id_a, id_b) rows — 32.6 s → 192 s at
      sf1, a 6× regression. One wide shuffle of small rows with map-side
      partial aggregation beats a 3.7×-pruned candidate set that ships
      arrays. The hot-shingle guard remains the skew lever.

    ``min_set_size`` (for absolute-cap scale runs, same contract as
    :func:`ngram_jaccard_pairs`): containment is MORE abstention-sensitive
    than Jaccard — C = |A∩B| / min(|A|,|B|), so a doc whose retained set
    shrinks to 2-3 rare shingles trivially reaches C = 1.0 against any doc
    sharing them. Pairs where either side's retained set is smaller than
    ``min_set_size`` are not emitted; 0 disables. The round-9 Heaps-decade
    measurement (HEAPS_r9.json) is why the cap mode exists for containment
    specifically: under the default ``auto`` cutoff (which scales with N),
    Zipf-head shingles pruned at small N are re-admitted as N grows and
    containment's decade wall ran ~2× the linear MinHash yardstick; a
    fixed cap restores the Σ_{df≤c} df² ≤ c·|shingle rows| linear bound.

    .. warning:: **the default ``auto`` cutoff is the ORACLE/BASELINE form,
       not the scale path** (decision pinned in PLANS.md §Round-10). It is
       N-complete — no pair is ever abstained — which is what an exactness
       oracle needs, and it is what the ``dedup_containment_pairs``
       registry query differential-tests. At corpus scale it is a MEASURED
       liability: 2.03× the linear MinHash yardstick across the
       sf1→sf10 Heaps decade (HEAPS_r9.json), mechanism understood
       (``greatest(1000, N/100)`` re-admits Zipf-head shingles as N
       grows). Production 100 TB runs should pass a FIXED
       ``max_shingle_freq`` cap with ``min_set_size ≥ 20`` — the
       ``dedup_containment_capped`` registry query's hash-checked
       contract (queries/dedup.py).

    ``max_shingle_freq="auto_cap"`` (round 12, VERDICT r11 next-round #4)
    makes that production choice automatic, extending the prefix filter's
    measured-crossover pattern: ONE aggregate over the raw shingle table
    (1-row collect, the bounded-collect class) computes the share of
    Σdf² carried by shingles with df > ``CONTAINMENT_CAP_DF``; above
    ``CONTAINMENT_CAP_SHARE`` the head dominates the complete join's
    volume and the FIXED cap is applied (with ``min_set_size`` raised to
    ``CONTAINMENT_CAP_MIN_SET`` if the caller left it 0 — capping without
    the abstention guard manufactures C=1.0 false positives); below it
    the N-complete ``"auto"`` cutoff is kept, because the cap would buy
    almost nothing. Unlike the prefix pick this changes the OUTPUT
    (capped mode abstains on head-heavy pairs), which is why the oracle
    registry queries pin their regimes explicitly (``"auto"`` complete
    for ``dedup_containment_pairs``, 64/20 for
    ``dedup_containment_capped``) and ``auto_cap`` is the non-oracle
    production default path; both regimes are independently hash-checked.
    Measured decision data: CONTAINMENT_CROSSOVER_r12.json.
    """
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    if max_shingle_freq == "auto_cap":
        sh = sh.transform(materialize)   # feeds the decision agg AND the join
        st = hot_share_stats(sh, CONTAINMENT_CAP_DF)
        share = st["share"]
        if share > CONTAINMENT_CAP_SHARE:
            max_shingle_freq = CONTAINMENT_CAP_DF
            if not min_set_size:
                min_set_size = CONTAINMENT_CAP_MIN_SET
            retained = st["retained"]
            if retained < 0.05:
                # Head-DEGENERATE corpus (measured: the bounded-vocabulary
                # TPC-H-ish fixture at sf1 — hot share 0.9983, cap retains
                # ~0% of occurrences, so capped containment abstains on
                # essentially every pair; CONTAINMENT_CROSSOVER_r12.json).
                # The cap is still the right BOUND, but the caller should
                # know exact containment carries no signal here and a
                # sketch (MinHash-LSH) is the usable family.
                import warnings

                warnings.warn(
                    f"containment_pairs auto_cap: hot shingles carry "
                    f"{share:.1%} of the join volume and the df<="
                    f"{CONTAINMENT_CAP_DF} cap retains only {retained:.1%} "
                    f"of shingle occurrences — capped containment will "
                    f"abstain on nearly all pairs on this corpus; prefer "
                    f"minhash_lsh_pairs for near-dup detection here",
                    RuntimeWarning, stacklevel=2)
        else:
            max_shingle_freq = "auto"
    sh = _prune_hot_shingles(sh, docs, max_shingle_freq)
    sh = sh.transform(materialize)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        common.join(sizes.withColumnRenamed("id", "id_a")
                    .withColumnRenamed("n_shingles", "size_a"), on="id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_shingles", "size_b"), on="id_b")
        .withColumn("_c", F.col("n_common")
                    / F.least("size_a", "size_b"))
        .withColumn("_j", F.col("n_common")
                    / (F.col("size_a") + F.col("size_b") - F.col("n_common")))
    )
    return (
        scored.where(F.col("_c") >= threshold)
        .where((F.least("size_a", "size_b") >= F.lit(min_set_size))
               if min_set_size else F.lit(True))
        .select("id_a", "id_b",
                F.round("_c", 6).alias("containment"),
                F.round("_j", 6).alias("jaccard"))
    )
