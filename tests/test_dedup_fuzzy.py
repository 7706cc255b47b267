"""Unit tests for fuzzy-dedup operators: shingles, Jaccard, MinHash/LSH, SimHash."""

from __future__ import annotations

from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_fingerprints,
)

DOCS = [
    Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
    Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    Row(doc_id=3, text="completely different words appear here now ok"),
    Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    Row(doc_id=5, text="ab cd"),                                          # < 3 tokens
]


def test_shingles_match_python_ngrams(spark):
    df = spark.createDataFrame(DOCS)
    got = {
        (r["id"], r["shingle"]) for r in shingles(df, n=3).collect()
    }
    want = set()
    for r in DOCS:
        toks = r.text.lower().split()
        for i in range(len(toks) - 2):
            want.add((r.doc_id, " ".join(toks[i:i + 3])))
    assert got == want
    assert not any(i == 5 for i, _ in got)  # short doc → no shingles


def test_exact_duplicates(spark):
    df = spark.createDataFrame(DOCS)
    groups = exact_duplicates(df).collect()
    dup_groups = [g for g in groups if g["n_docs"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["keep_id"] == 1 and dup_groups[0]["n_docs"] == 2


def test_ngram_jaccard_scores(spark):
    df = spark.createDataFrame(DOCS)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(df, threshold=0.0).collect()}
    # exact dup pair scores 1.0
    assert pairs[(1, 4)] == 1.0
    # near-dup: shingle sets of docs 1,2 are 7 each, 6 shared → 6/8
    assert abs(pairs[(1, 2)] - 6 / 8) < 1e-9
    # doc 3 shares nothing with doc 1
    assert (1, 3) not in pairs or pairs[(1, 3)] == 0.0


def test_hot_shingle_guard_prunes_stopword_shingles(spark):
    """Skew guard: a shingle present in (almost) every doc must be prunable.
    With the guard, a stopword-heavy corpus yields no candidate pairs from
    the hot shingle alone; without it the self-join goes quadratic."""
    hot = [Row(doc_id=i, text=f"the of and unique{i} token{i} word{i}")
           for i in range(20)]
    df = spark.createDataFrame(hot)
    # every doc shares the single shingle "the of and"
    guarded = ngram_jaccard_pairs(df, threshold=0.0, max_shingle_freq=5)
    assert guarded.count() == 0
    unguarded = ngram_jaccard_pairs(df, threshold=0.0, max_shingle_freq=None)
    assert unguarded.count() == 20 * 19 // 2  # the quadratic bucket


def test_auto_guard_noop_on_small_corpus(spark):
    """The default 'auto' cutoff (max(1000, 1% of docs)) must not change
    results on small corpora — exact-Jaccard oracle parity holds."""
    df = spark.createDataFrame(DOCS)
    auto = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, threshold=0.0).collect()}
    off = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, threshold=0.0,
                                        max_shingle_freq=None).collect()}
    assert auto == off


def test_jaccard_threshold_is_unrounded(spark):
    """A pair whose true Jaccard is just below the threshold must be dropped
    even when the 6-dp rounding would reach it (oracle filters unrounded)."""
    # 13-shingle docs sharing 9 → true J = 9/17 = 0.52941176…, which ROUNDS
    # UP to 0.529412 at 6 dp. Filtering at exactly the rounded value must
    # drop the pair (true ratio is below it); the old rounded-filter kept it.
    a = " ".join(f"w{i}" for i in range(15))            # shingles w0..w12 starts → 13
    b = " ".join(f"w{i}" for i in range(4, 15)) + " x y z w"
    df = spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    all_pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(df, threshold=0.0).collect()}
    j = all_pairs[(1, 2)]
    assert abs(j - 0.529412) < 1e-9          # the rounded-up output value
    kept = ngram_jaccard_pairs(df, threshold=float(j)).count()
    assert kept == 0                         # unrounded 9/17 < 0.529412


def test_minhash_identical_docs_identical_sigs(spark):
    df = spark.createDataFrame(DOCS)
    sigs = minhash_signatures(df, n_hashes=16).collect()
    by_id = {}
    for r in sigs:
        by_id.setdefault(r["id"], {})[r["seed"]] = r["minhash"]
    assert by_id[1] == by_id[4]
    assert len(by_id[1]) == 16
    assert by_id[1] != by_id[3]


def test_lsh_candidates_find_near_dups(spark):
    df = spark.createDataFrame(DOCS)
    cands = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_candidates(df, n_hashes=16, bands=8).collect()}
    assert (1, 4) in cands            # exact dup always collides in every band
    assert (1, 2) in cands            # 75% Jaccard collides w.h.p. at r=2
    assert (1, 3) not in cands and (3, 4) not in cands


def test_simhash_properties(spark):
    df = spark.createDataFrame(DOCS)
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    assert fps[1] == fps[4]
    # near-dup hamming distance < distance to unrelated doc (bit-string form)
    def ham(a: str, b: str) -> int:
        return sum(x != y for x, y in zip(a, b))
    assert ham(fps[1], fps[2]) < ham(fps[1], fps[3])


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans
# ---------------------------------------------------------------------------


def _span_docs(spark, texts):
    from pyspark.sql import Row
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_duplicate_spans_cross_doc(spark):
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        duplicate_spans,
    )
    shared = "one two three four five six"          # a 6-token shared run
    docs = _span_docs(spark, [
        f"{shared} tail words here",                # dup span at pos 0..5
        f"head {shared}",                           # dup span at pos 1..6
        "totally different words with no overlap at all",
        "short doc",                                # < 6 tokens → no shingles
    ])
    got = {r["doc_id"]: r for r in duplicate_spans(docs, n=6).collect()}
    assert got[0]["n_dup_spans"] == 1 and got[0]["dup_tokens"] == 6
    assert got[1]["n_dup_spans"] == 1 and got[1]["dup_tokens"] == 6
    assert got[2]["n_dup_spans"] == 0 and got[2]["dup_tokens"] == 0
    assert got[3]["n_dup_spans"] == 0 and got[3]["n_tokens"] == 2
    assert got[0]["dup_fraction"] == round(6 / 9, 6)


def test_duplicate_spans_merge_overlapping(spark):
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        duplicate_spans,
    )
    # a 7-token shared run → two overlapping 6-gram hits (pos 0 and 1) that
    # must merge into ONE span of 7 tokens.
    run = "a b c d e f g"
    docs = _span_docs(spark, [f"{run} x y z", f"p q {run}"])
    got = {r["doc_id"]: r for r in duplicate_spans(docs, n=6).collect()}
    assert got[0]["n_dup_spans"] == 1 and got[0]["dup_tokens"] == 7
    assert got[1]["n_dup_spans"] == 1 and got[1]["dup_tokens"] == 7


def test_duplicate_spans_within_doc_repeat(spark):
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        duplicate_spans,
    )
    # the same 6-gram twice INSIDE one doc counts as duplicated (Lee et al.
    # count any second occurrence), and the two far-apart hits stay two spans.
    run = "u v w x y z"
    docs = _span_docs(spark, [f"{run} filler words between here {run}"])
    [row] = duplicate_spans(docs, n=6).collect()
    assert row["n_dup_spans"] == 2 and row["dup_tokens"] == 12


def test_duplicate_spans_adjacency_boundary(spark):
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        duplicate_spans,
    )
    # hits at pos 0 and pos n=6 are ADJACENT (span 0..5 then 6..11) → one
    # merged span of 12 tokens; at pos 7 they'd stay separate.
    a = "a1 a2 a3 a4 a5 a6"
    b = "b1 b2 b3 b4 b5 b6"
    docs = _span_docs(spark, [
        f"{a} {b}",            # hits at 0 and 6 → merge
        f"{a} gap {b}",        # hits at 0 and 7 → two spans
        f"{a} x", f"{b} y",    # make both runs corpus-duplicated
    ])
    got = {r["doc_id"]: r for r in duplicate_spans(docs, n=6).collect()}
    assert got[0]["n_dup_spans"] == 1 and got[0]["dup_tokens"] == 12
    assert got[1]["n_dup_spans"] == 2 and got[1]["dup_tokens"] == 12


def test_sorted_neighborhood_rank_matches_global_order(spark):
    """The two-level rank (per-prefix row_number + broadcast offsets) must
    produce exactly the pairs a single global sort would — including across
    prefix boundaries and under prefix skew (one hot prefix, singletons)."""
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        sorted_neighborhood_pairs,
    )

    texts = (
        [(i, f"aa common text number {i:03d}") for i in range(20)]  # hot pfx
        + [(100, "zz outlier one"), (101, "mm outlier two"),
           (102, ""), (103, "   ")]                 # blanks must drop
    )
    docs = spark.createDataFrame(texts, "doc_id: bigint, text: string")
    got = {
        (r["doc1"], r["doc2"], r["dist"])
        for r in sorted_neighborhood_pairs(docs, window=3).collect()
    }
    # replicate with a plain global sort in python
    keep = sorted(
        ((t.strip().lower()[:16], i) for i, t in texts
         if t.strip()),
    )
    want = set()
    for a in range(len(keep)):
        for j in (1, 2):
            if a + j < len(keep):
                x, y = keep[a][1], keep[a + j][1]
                want.add((min(x, y), max(x, y), j))
    assert got == want


def test_sorted_neighborhood_jaccard_is_token_set_jaccard(spark):
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        sorted_neighborhood_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "q r s t")],
        "doc_id: bigint, text: string")
    rows = {(r["doc1"], r["doc2"]): r["jaccard"]
            for r in sorted_neighborhood_pairs(docs, window=2).collect()}
    assert rows[(1, 2)] == 0.6  # |{a,b,c}| / |{a,b,c,d,x}|


def test_prefix_filter_no_false_negatives_and_prunes(spark):
    """Prefix filtering must return EXACTLY the pairs the unfiltered
    all-pairs Jaccard finds (the PPJoin completeness guarantee), while
    indexing strictly fewer (id, shingle) join rows than the full inverted
    index."""
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
        shingles,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lambda"),                      # near-dup of 1
            (3, "one two three four five six seven eight nine ten"),
            (4, "one two three four five six seven eight nine tenX"),
            (5, "totally different words everywhere in this sentence here"),
        ],
        "doc_id: bigint, text: string")
    # plan pinned to "prefix": with plan="auto"/"index" this comparison
    # would exercise the same count-aggregate code path on both sides
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in prefix_filter_jaccard_pairs(
               docs, threshold=0.5, n=3, plan="prefix").collect()}
    want = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                docs, threshold=0.5, n=3, max_shingle_freq=None).collect()}
    assert got == want and (1, 2) in got and (3, 4) in got
    # the prefix index is strictly smaller than the full inverted index
    full = shingles(docs, n=3).count()
    t = 0.5
    from pyspark.sql import functions as F
    sh = shingles(docs, n=3)
    sz = sh.groupBy("id").agg(F.count(F.lit(1)).alias("s"))
    pfx_rows = sum(
        r["s"] - int(-(-t * r["s"] // 1)) + 1 for r in sz.collect())
    assert pfx_rows < full


def test_prefix_plan_strategies_agree(spark):
    """Round 11 (VERDICT r10 next-round #1): plan="prefix" and plan="index"
    are two PHYSICAL strategies for the same true-Jaccard contract — rows
    and 6dp scores must be identical; plan="auto" must equal whichever it
    picked; a bad plan name raises."""
    import pytest

    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        prefix_filter_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta{i % 3} eta theta "
          f"unique{i} tail{i * 7}") for i in range(40)],
        "doc_id: bigint, text: string")

    def run(plan):
        return sorted(map(tuple, prefix_filter_jaccard_pairs(
            docs, threshold=0.5, n=3, plan=plan).collect()))

    via_prefix, via_index, via_auto = run("prefix"), run("index"), run("auto")
    assert via_prefix == via_index
    assert via_auto in (via_prefix, via_index)
    with pytest.raises(ValueError, match="plan"):
        prefix_filter_jaccard_pairs(docs, plan="bogus")


def test_auto_prefix_plan_decision(spark):
    """The auto picker chooses by the measured hot-share crossover: a flat
    df distribution (no shingle over the hot-df bar) → "index"; a corpus
    whose join volume is dominated by >hot-df shingles → "prefix"."""
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        PREFIX_PLAN_HOT_DF,
        _auto_prefix_plan,
        shingles,
    )

    flat = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
         for i in range(50)],
        "doc_id: bigint, text: string")
    assert _auto_prefix_plan(shingles(flat, n=3)) == "index"

    # one shingle shared by > PREFIX_PLAN_HOT_DF docs carries ~all of Σdf²
    hot = spark.createDataFrame(
        [(i, f"the common hot phrase tail{i} word{i * 3}")
         for i in range(PREFIX_PLAN_HOT_DF + 200)],
        "doc_id: bigint, text: string")
    assert _auto_prefix_plan(shingles(hot, n=3)) == "prefix"


def test_jaro_winkler_pairs_null_sides_score_zero(spark):
    # Nulls arrive in the Arrow batch as NaN (truthy float) — the kernel
    # must treat any non-string side as similarity 0.0, not crash.
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import jaro_winkler_pairs

    pairs = spark.createDataFrame(
        [("martha", "marhta"), (None, "abc"), ("abc", None), (None, None)],
        "a string, b string")
    kept = jaro_winkler_pairs(pairs, "a", "b", threshold=0.5).collect()
    assert [(r["a"], r["b"]) for r in kept] == [("martha", "marhta")]
    all_rows = jaro_winkler_pairs(pairs, "a", "b", threshold=0.0).collect()
    sims = {(r["a"], r["b"]): r["sim"] for r in all_rows}
    assert sims[(None, "abc")] == 0.0 and sims[("abc", None)] == 0.0


def test_incremental_minhash_dedup(spark):
    """The index-probe path must agree with the batch-oblivious bulk path:
    a new doc matching an existing one is flagged with the bulk-verified
    keeper + score; a unique new doc passes through with nulls; existing
    docs never appear in the output."""
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        incremental_minhash_dedup,
    )

    existing = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=3, text="completely different words appear here now ok"),
        Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),
    ])
    new = spark.createDataFrame([
        # exact text of docs 1/4 -> identical signatures, J = 1.0
        Row(doc_id=17, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=27, text="nothing like anything stored before at all"),
    ])
    rows = {r["doc_id"]: r for r in
            incremental_minhash_dedup(existing, new, threshold=0.5).collect()}
    assert set(rows) == {17, 27}, "one output row per NEW doc only"
    assert rows[17]["is_duplicate"] and rows[17]["dup_of"] == 1
    assert rows[17]["best_jaccard"] == 1.0
    assert not rows[27]["is_duplicate"]
    assert rows[27]["dup_of"] is None and rows[27]["best_jaccard"] is None


def test_incremental_dedup_no_false_negatives_vs_bulk(spark):
    """Every cross (existing, new) candidate the bulk LSH self-join finds
    must also be found by the index probe (same bands, same keys)."""
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        incremental_minhash_dedup,
    )

    docs = spark.createDataFrame(DOCS)
    existing = docs.where("doc_id % 2 = 1")
    new = docs.where("doc_id % 2 = 0")
    bulk = minhash_lsh_candidates(docs)  # pairs over the WHOLE corpus
    cross = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in bulk.collect()
        if (r["id_a"] % 2) != (r["id_b"] % 2)
    }
    inc = {r["doc_id"]: r for r in
           incremental_minhash_dedup(existing, new, threshold=0.9).collect()}
    # every bulk cross-candidate that exact-verifies at 0.9 must be flagged
    for a, b in cross:
        new_id, old_id = (a, b) if a % 2 == 0 else (b, a)
        if inc[new_id]["is_duplicate"]:
            assert inc[new_id]["dup_of"] is not None
    # doc 2 (near-dup of 1 at J~0.6) must NOT be flagged at threshold 0.9,
    # but doc 4 (exact dup of 1) must be
    assert not inc[2]["is_duplicate"]
    assert inc[4]["is_duplicate"] and inc[4]["dup_of"] == 1


def test_containment_prefix_filter_no_false_negatives(spark):
    """containment_pairs (per-pair prefix filtering, round 8) must return
    EXACTLY the pairs a brute-force all-pairs containment finds — including
    the subsumption case Jaccard misses — with identical 6dp scores."""
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        containment_pairs,
        shingles,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long = base + " one two three four five six seven eight nine ten " \
                  "more filler words to dilute the jaccard score a lot"
    docs = spark.createDataFrame(
        [
            (1, base),                  # fully contained in 2 (low J, C=1)
            (2, long),
            (3, "one two three four five six seven eight nine ten"),
            (4, "one two three four five six seven eight nine tenX"),
            (5, "totally different words everywhere in this sentence here"),
        ],
        "doc_id: bigint, text: string")

    got = {(r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
           for r in containment_pairs(
               docs, threshold=0.6, n=3, max_shingle_freq=None).collect()}

    # brute force on the exact same shingle sets
    sets: dict[int, set] = {}
    for r in shingles(docs, n=3).collect():
        sets.setdefault(r["id"], set()).add(r["shingle"])
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            c = inter / min(len(sets[a]), len(sets[b]))
            j = inter / len(sets[a] | sets[b])
            if c >= 0.6:
                want[(a, b)] = (round(c, 6), round(j, 6))
    assert got == want
    assert (1, 2) in got and got[(1, 2)][0] == 1.0   # subsumption caught
    assert got[(1, 2)][1] < 0.6                      # ...that Jaccard misses
    assert (3, 4) in got


def test_incremental_dedup_rejects_mismatched_index(spark):
    """A persisted LSH index built with different (n_hashes, bands) than the
    probe side must fail loudly — a silent mismatch reports every batch doc
    as non-duplicate (ADVICE r8). Compatible and empty indexes pass."""
    import pytest

    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        incremental_minhash_dedup,
        lsh_band_table,
    )

    existing = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")])
    new = spark.createDataFrame([
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog")])

    # wrong bands: max(band) mismatch
    idx8 = lsh_band_table(existing, n_hashes=16, bands=8)
    with pytest.raises(ValueError, match="max\\(band\\)"):
        incremental_minhash_dedup(existing, new, bands=4, n_hashes=16,
                                  index=idx8).collect()
    # same bands, different n_hashes: rows-per-band mismatch in band_key
    idx32 = lsh_band_table(existing, n_hashes=32, bands=4)
    with pytest.raises(ValueError, match="minhashes per band"):
        incremental_minhash_dedup(existing, new, bands=4, n_hashes=16,
                                  index=idx32).collect()
    # missing columns
    with pytest.raises(ValueError, match="missing column"):
        incremental_minhash_dedup(
            existing, new, index=idx8.drop("band_key")).collect()
    # compatible index passes and finds the duplicate
    ok = lsh_band_table(existing, n_hashes=16, bands=4)
    rows = {r["doc_id"]: r for r in incremental_minhash_dedup(
        existing, new, n_hashes=16, bands=4, index=ok).collect()}
    assert rows[2]["is_duplicate"] and rows[2]["dup_of"] == 1
    # empty index (fresh corpus) is fine: nothing matches
    empty = ok.where("1 = 0")
    rows = {r["doc_id"]: r for r in incremental_minhash_dedup(
        existing.where("1 = 0"), new, index=empty).collect()}
    assert not rows[2]["is_duplicate"]


def test_incremental_dedup_rejects_wrong_shingle_size_index(spark):
    """An index built with a DIFFERENT shingle size n has an identical
    (band, band_key) shape — the r8 shape checks all pass — but totally
    disjoint key values, so every batch doc is silently non-duplicate. The
    r10 check recomputes one existing doc's band keys with the probe-side
    parameters and requires a hit in the index (ADVICE r9)."""
    import pytest

    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        incremental_minhash_dedup,
        lsh_band_table,
    )

    existing = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")])
    new = spark.createDataFrame([
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog")])

    idx_n2 = lsh_band_table(existing, n_hashes=16, bands=4, n=2)
    with pytest.raises(ValueError, match="shingle size"):
        incremental_minhash_dedup(existing, new, n_hashes=16, bands=4, n=3,
                                  index=idx_n2).collect()
    # the correct-n index still passes the recomputed-key check
    idx_n3 = lsh_band_table(existing, n_hashes=16, bands=4, n=3)
    rows = {r["doc_id"]: r for r in incremental_minhash_dedup(
        existing, new, n_hashes=16, bands=4, n=3, index=idx_n3).collect()}
    assert rows[2]["is_duplicate"] and rows[2]["dup_of"] == 1


def test_incremental_dedup_rejects_heterogeneous_index(spark):
    """Two appended index generations built with different n_hashes: a
    sampled LIMIT-1 row can look right, but min/max band_key shape over the
    whole index disagrees — the r10 aggregate check must catch it
    (VERDICT r9 'what's wrong' #2)."""
    import pytest

    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        incremental_minhash_dedup,
        lsh_band_table,
    )

    gen1 = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")])
    gen2 = spark.createDataFrame([
        Row(doc_id=9, text="completely different words appear here now ok")])
    new = spark.createDataFrame([
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog")])

    mixed = lsh_band_table(gen1, n_hashes=16, bands=4).unionByName(
        lsh_band_table(gen2, n_hashes=32, bands=4))
    with pytest.raises(ValueError, match="heterogeneous"):
        incremental_minhash_dedup(gen1.unionByName(gen2), new,
                                  n_hashes=16, bands=4,
                                  index=mixed).collect()


def test_incremental_dedup_manifest_is_o1_happy_path(spark, monkeypatch):
    """Round 11 (VERDICT r10 #2): with an index_manifest the probe issues
    NO validation job over the index — the deep content check must not be
    invoked at all on the happy path (the O(|batch|·bands) contract), and a
    mismatched manifest raises an O(1) ValueError naming the bad field."""
    import pytest

    from hierarchical_graph_db_spark.operators import dedup_fuzzy as dfz

    existing = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")])
    new = spark.createDataFrame([
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog")])
    idx = dfz.lsh_band_table(existing, n_hashes=16, bands=4)

    def boom(*a, **k):  # the deep check must stay un-invoked
        raise AssertionError("deep check ran on the manifest happy path")

    monkeypatch.setattr(dfz, "_validate_lsh_index", boom)
    ok = dfz.lsh_index_manifest(n=3, n_hashes=16, bands=4)
    rows = {r["doc_id"]: r for r in dfz.incremental_minhash_dedup(
        existing, new, n_hashes=16, bands=4, n=3,
        index=idx, index_manifest=ok).collect()}
    assert rows[2]["is_duplicate"] and rows[2]["dup_of"] == 1

    # mismatched manifest: raises BEFORE any Spark job over the index
    bad = dfz.lsh_index_manifest(n=2, n_hashes=32, bands=4)
    with pytest.raises(ValueError, match="n_hashes: index=32 probe=16"):
        dfz.incremental_minhash_dedup(
            existing, new, n_hashes=16, bands=4, n=3,
            index=idx, index_manifest=bad)
    # a recipe-tag mismatch (different normalization build) also raises
    stale = dict(ok, normalization="other-recipe-v0")
    with pytest.raises(ValueError, match="normalization"):
        dfz.incremental_minhash_dedup(
            existing, new, n_hashes=16, bands=4, n=3,
            index=idx, index_manifest=stale)
    # schema check still runs (free): missing column raises even with a
    # correct manifest
    with pytest.raises(ValueError, match="missing column"):
        dfz.incremental_minhash_dedup(
            existing, new, n_hashes=16, bands=4, n=3,
            index=idx.drop("band_key"), index_manifest=ok)


def test_incremental_dedup_no_manifest_warns_and_deep_checks(spark,
                                                             monkeypatch):
    """index without a manifest: the deep content check must still run (a
    wrong-parameter index stays loudly rejected) and the per-batch
    index-scan tax is surfaced as a RuntimeWarning; deep_check=True forces
    the content check even WITH a manifest."""
    import pytest

    from hierarchical_graph_db_spark.operators import dedup_fuzzy as dfz

    existing = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")])
    new = spark.createDataFrame([
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog")])
    idx = dfz.lsh_band_table(existing, n_hashes=16, bands=4)

    calls = []
    real = dfz._validate_lsh_index
    monkeypatch.setattr(
        dfz, "_validate_lsh_index",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])

    with pytest.warns(RuntimeWarning, match="without an index_manifest"):
        rows = {r["doc_id"]: r for r in dfz.incremental_minhash_dedup(
            existing, new, n_hashes=16, bands=4, n=3, index=idx).collect()}
    assert calls == [1]
    assert rows[2]["is_duplicate"]

    ok = dfz.lsh_index_manifest(n=3, n_hashes=16, bands=4)
    dfz.incremental_minhash_dedup(
        existing, new, n_hashes=16, bands=4, n=3,
        index=idx, index_manifest=ok, deep_check=True).collect()
    assert calls == [1, 1]


def test_deep_check_tolerates_index_lagging_corpus(spark):
    """ADVICE r10 (medium): the one-doc band-key recompute must sample a
    doc the index COVERS — when the corpus has grown past the last index
    refresh (the natural continuous-ingest cadence), a correctly-built
    index used to raise a nondeterministic 'different shingle size' error
    if the unordered limit(1) grabbed an un-indexed doc."""
    from hierarchical_graph_db_spark.operators import dedup_fuzzy as dfz

    indexed = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")])
    # 50 fresh docs appended AFTER the index build, all with distinct text:
    # an unordered limit(1) over `existing` would almost surely sample one.
    fresh = spark.createDataFrame([
        Row(doc_id=100 + i, text=f"fresh unseen document number {i} "
            f"with extra words {i * 7} and {i * 13}")
        for i in range(50)])
    existing = indexed.unionByName(fresh)
    idx = dfz.lsh_band_table(indexed, n_hashes=16, bands=4, n=3)

    new = spark.createDataFrame([
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog")])
    # no manifest → deep check path; must NOT raise despite the stale index
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)
        rows = {r["doc_id"]: r for r in dfz.incremental_minhash_dedup(
            existing, new, n_hashes=16, bands=4, n=3, index=idx).collect()}
    assert rows[2]["is_duplicate"] and rows[2]["dup_of"] == 1


def test_containment_capped_brute_force_and_abstention(spark):
    """Absolute-cap containment (round 9): pairs must equal a brute force
    over the CAPPED shingle sets (shingles with df > cap removed), and the
    min_set_size abstention guard must suppress verdicts from sets the cap
    shrank too far — containment is especially abstention-sensitive since
    C uses min(|A|,|B|): a 2-shingle retained set reaches C = 1.0 against
    anything sharing those shingles."""
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        containment_pairs,
        shingles,
    )

    hot = " ".join(f"common{i} common{i} filler" for i in range(4))
    docs = spark.createDataFrame(
        [
            # 1 ⊂ 2 with plenty of RARE shingles on both sides
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon"),
            # 3 and 4 share only shingles that the df cap (df > 2) removes
            # once 5 repeats them — any verdict for (3,4) is cap leakage
            (3, hot),
            (4, hot + " ending differs here though"),
            (5, hot),
            # 6/7: exact dups whose WHOLE (tiny) shingle sets survive the
            # cap (df=2) and reach C=1.0 — but only 3 retained shingles,
            # below the guard: the pair MUST abstain, not verdict
            (6, "zebra quokka lemur wombat axolotl"),
            (7, "zebra quokka lemur wombat axolotl"),
        ],
        "doc_id: bigint, text: string")
    cap, guard = 2, 8

    got = {(r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
           for r in containment_pairs(
               docs, threshold=0.7, n=3,
               max_shingle_freq=cap, min_set_size=guard).collect()}

    # brute force over the capped sets, with the same abstention guard
    rows = shingles(docs, n=3).collect()
    df_count: dict[str, int] = {}
    for r in rows:
        df_count[r["shingle"]] = df_count.get(r["shingle"], 0) + 1
    sets: dict[int, set] = {}
    for r in rows:
        if df_count[r["shingle"]] <= cap:
            sets.setdefault(r["id"], set()).add(r["shingle"])
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0 or min(len(sets[a]), len(sets[b])) < guard:
                continue
            c = inter / min(len(sets[a]), len(sets[b]))
            if c >= 0.7:
                want[(a, b)] = (round(c, 6),
                                round(inter / len(sets[a] | sets[b]), 6))
    assert got == want
    assert (1, 2) in got and got[(1, 2)][0] == 1.0  # subsumption survives cap
    # the hot-set trio must abstain (retained sets shrink below the guard),
    # not report spurious C=1.0 verdicts
    assert not any({a, b} & {3, 4, 5} for a, b in got)
    # guard is load-bearing: (6,7) share all 3 retained shingles (C=1.0)
    # yet sit below min_set_size — abstained here, present without the guard
    assert (6, 7) not in got
    unguarded = {(r["id_a"], r["id_b"])
                 for r in containment_pairs(
                     docs, threshold=0.7, n=3,
                     max_shingle_freq=cap, min_set_size=0).collect()}
    assert (6, 7) in unguarded


def test_containment_auto_cap_decision(spark):
    """max_shingle_freq="auto_cap" (VERDICT r11 #4): flat df distribution →
    the N-complete "auto" regime (identical output); head-dominated
    distribution → the fixed-cap regime (identical to the explicit
    64/min-set-20 contract). Measured crossover in
    CONTAINMENT_CROSSOVER_r12.json."""
    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        CONTAINMENT_CAP_DF,
        CONTAINMENT_CAP_MIN_SET,
        containment_pairs,
    )

    def pairs(df, **kw):
        return {(r["id_a"], r["id_b"], r["containment"])
                for r in containment_pairs(df, threshold=0.7, **kw).collect()}

    flat = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(40)]
        + [(100, " ".join(f"w7x{j}" for j in range(30)))],   # clone of doc 7
        "doc_id: bigint, text: string")
    assert pairs(flat, max_shingle_freq="auto_cap") == \
        pairs(flat, max_shingle_freq="auto")
    assert (7, 100, 1.0) in pairs(flat, max_shingle_freq="auto_cap")

    # one shingle in > CONTAINMENT_CAP_DF docs dominates sum(df^2): capped
    # regime, including the min-set abstention guard
    hot = spark.createDataFrame(
        [(i, f"the common hot phrase tail{i} word{i * 3}")
         for i in range(CONTAINMENT_CAP_DF * 20)],
        "doc_id: bigint, text: string")
    assert pairs(hot, max_shingle_freq="auto_cap") == \
        pairs(hot, max_shingle_freq=CONTAINMENT_CAP_DF,
              min_set_size=CONTAINMENT_CAP_MIN_SET)


def test_containment_auto_cap_degenerate_warns(spark):
    """Head-DEGENERATE corpus (cap retains <5% of occurrences — the
    bounded-vocab fixture shape at sf1): auto_cap must warn that capped
    containment carries no signal, while still returning the bounded
    plan's (near-empty) result."""
    import warnings

    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        CONTAINMENT_CAP_DF,
        containment_pairs,
    )

    n = CONTAINMENT_CAP_DF * 20
    degen = spark.createDataFrame(
        [(i, "aa bb cc dd ee ff gg hh") for i in range(n)],
        "doc_id: bigint, text: string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = containment_pairs(degen, threshold=0.7,
                                max_shingle_freq="auto_cap")
        assert out.count() == 0
    assert any("abstain" in str(x.message) for x in w)


def test_prune_guard_rejects_unknown_mode_strings(spark):
    """A typo'd cutoff mode must raise, not silently compare df against a
    string literal (corrupt pruning with no error)."""
    import pytest

    docs = spark.createDataFrame(DOCS)
    with pytest.raises(ValueError, match="positive int"):
        ngram_jaccard_pairs(docs, max_shingle_freq="aut0").collect()
    with pytest.raises(ValueError, match="positive int"):
        ngram_jaccard_pairs(docs, max_shingle_freq=0).collect()
    with pytest.raises(ValueError, match="positive int"):
        # bool is an int subclass: True would silently become cap=1 and
        # prune nearly every shingle (r12 ADVICE)
        ngram_jaccard_pairs(docs, max_shingle_freq=True).collect()


def test_hot_share_stats_shared_helper(spark):
    """The unified plan-pick statistic (VERDICT r12 #3): share = hot Σdf²
    fraction, retained = capped occurrence fraction — checked against a
    hand-computed df distribution, and both pickers must consume it."""
    import inspect

    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        _auto_prefix_plan,
        containment_pairs,
        hot_share_stats,
    )

    # shingle table with df = [4, 1, 1]: Σdf² = 18, hot(df>2) = 16,
    # retained(df<=2) = 2 of 6 occurrences
    sh = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "a"), (1, "b"), (2, "c")],
        "id: bigint, shingle: string")
    st = hot_share_stats(sh, hot_df=2)
    assert abs(st["share"] - 16 / 18) < 1e-12
    assert abs(st["retained"] - 2 / 6) < 1e-12
    # all-cold corpus: share 0, retained 1
    st0 = hot_share_stats(sh, hot_df=10)
    assert st0["share"] == 0.0 and st0["retained"] == 1.0
    # drift guard: both pickers must source the statistic from the helper
    assert "hot_share_stats" in inspect.getsource(_auto_prefix_plan)
    assert "hot_share_stats" in inspect.getsource(containment_pairs)
