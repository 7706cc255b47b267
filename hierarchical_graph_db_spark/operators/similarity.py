"""Similarity search over embedding columns (SURVEY.md §2.11).

Two paths:

* ``brute_force_topk`` — exact cosine top-k via broadcast cross-join +
  per-query window. Correctness baseline; fine whenever the *query* set is
  small (it broadcasts) even if the corpus is 100 TB — the corpus side only
  scans, no shuffle except the final per-query top-k aggregation.
* ``lsh_topk`` — approximate scale path: random-hyperplane LSH buckets
  (SimHash for vectors); candidates = same-bucket pairs only, so the
  cross-join shrinks from |Q|×|C| to per-bucket blocks.

Kernel design for the quadratic stages: each side projects its L2 norm once
(linear pass), so a pair costs exactly one dot product. Two kernels:

* top-k paths (small pair counts) use an *unrolled* arithmetic expression
  that whole-stage codegen compiles — higher-order ``aggregate``/``zip_with``
  lambdas are interpreted per element and measured ~10× slower;
* the near-dup pair stages (millions of pairs) rescore through an
  Arrow-batched numpy kernel (``_score_pairs_arrow``) — another ~7× over
  the unrolled expression, with engineered bit-parity (left-fold order,
  Catalyst-side rounding) so the DuckDB oracles still hash-match.

Float semantics are identical to ``cosine_similarity`` (dot/(na·nb)), which
the DuckDB oracles mirror term for term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from hierarchical_graph_db_spark.materialize import materialize

from hierarchical_graph_db_spark.functions.vectors import (
    cosine_from_parts,
    dot,
    dot_static,
    l2_norm,
)


def _dot(a, b, dim: int | None):
    """``a``/``b`` may be column names (str) — with ``dim`` set they take
    dot_static's one-parsed-expression fast build path."""
    if dim:
        return dot_static(a, b, dim)
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query row.

    Output: (query_id, neighbor_id, score, rank). The score is rounded before
    ranking so the rank order is reproducible across platforms; ties break by
    neighbor id (deterministic total order). Pass ``dim`` when the embedding
    width is known — enables the unrolled codegen dot product.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)  # query side is small by contract; corpus side streams
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_parts(
                    _dot("q_vec", "c_vec", dim),
                    F.col("q_norm"),
                    F.col("c_norm"),
                ),
                round_digits,
            ).alias("score"),
        )
    )
    return _topk(scored, k)


def hyperplane_signature(vec_col: str, n_planes: int, dim: int,
                         plane_offset: int = 0):
    """LSH bit-signature: sign of ⟨v, hᵖ⟩ for n deterministic hyperplanes.

    Hyperplane p's component for dimension d is +1/-1 by parity of
    ``sha256(p:d)`` — deterministic, no stored model. Returns a string column
    of '0'/'1' bits (bucket key material). Each projection is an unrolled
    signed sum — codegen-compiled, no per-element lambda interpretation —
    generated as ONE SQL string parsed by a single ``F.expr`` call: building
    the same tree out of Python ``Column`` ops costs a py4j round-trip per
    term (~10 s of pure driver time at 16 planes × 64 dims).
    ``vec_col`` is a column NAME (the expression embeds it); ``plane_offset``
    shifts plane indices so banded callers draw independent families from
    the same hash stream.
    """
    import re

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", vec_col):
        raise ValueError(
            f"hyperplane_signature expects a plain column identifier, "
            f"got {vec_col!r}"
        )
    bits = []
    for p in range(plane_offset, plane_offset + n_planes):
        # left-assoc " + " chain == the oracle's term order (float parity)
        terms = " + ".join(
            f"CAST(`{vec_col}`[{d}] AS DOUBLE) * {1.0 if hash_sign(p, d) else -1.0}"
            for d in range(dim)
        )
        bits.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def hash_sign(plane: int, dim: int) -> bool:
    """Deterministic sign for (plane, dim) — stable across processes.

    sha256, NOT crc32: CRC is linear over GF(2), so the parity bits of
    same-length inputs differ by a constant XOR — crc-derived sign vectors
    for different planes come out identical or complementary (measured:
    8 "planes" collapsed to ~2 effective ones, same-cluster Hamming
    distances only {0,4,8}). A cryptographic hash gives independent signs.
    """
    import hashlib

    return bool(hashlib.sha256(f"{plane}:{dim}".encode()).digest()[0] & 1)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates restricted to equal LSH bucket.

    At 100 TB: corpus is written bucketed/partitioned by ``bucket`` once;
    queries hash to buckets and the join becomes a co-located equi-join on a
    key with ~|corpus|/2^n_planes rows per bucket — no quadratic blowup.
    Recall tunes via n_planes (fewer planes → bigger buckets → higher recall).

    ``multi_probe=True`` additionally probes every Hamming-1 neighbor bucket
    (the query side explodes to n_planes+1 probe keys; the CORPUS layout is
    untouched, so the same prebuilt bucketed corpus serves both modes) —
    recall of a coarser table at the bucket-size of a finer one, the
    classic multi-probe LSH trade.

    Scale guidance (measured at the sf1 embedding shape, 20k x 64 dims,
    tests/test_similarity_recall_sf1.py): when true nearest neighbors sit at
    wide angles (~59 deg mean there — the normal high-dimensional regime),
    a random hyperplane separates a true pair with p ~ 1/3 and NO
    table/plane/probe configuration reaches 0.8 recall below ~50% corpus
    scanned. Use :func:`hierarchical_graph_db_spark.operators.ivf.ivf_topk`
    for top-k at that shape (>= 0.9 recall probing 20%); hyperplane BANDING
    stays right for threshold near-dup (:func:`near_duplicate_pairs`).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        hyperplane_signature(vec_col, n_planes, dim).alias("bucket"),
    )
    if multi_probe:
        # n_planes+1 distinct probe keys per query (exact + each Hamming-1
        # flip); each corpus vector lives in ONE
        # bucket, so a (query, neighbor) pair can match at most once — no
        # dedup needed after the join.
        probes = [F.col("bucket")]
        for i in range(1, n_planes + 1):
            flipped = F.when(
                F.substring("bucket", i, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1"))
            probes.append(
                F.concat(
                    F.substring("bucket", 1, i - 1),
                    flipped,
                    F.substring("bucket", i + 1, n_planes - i),
                )
            )
        q = q.withColumn("bucket", F.explode(F.array(*probes)))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        hyperplane_signature(vec_col, n_planes, dim).alias("bucket"),
    )
    scored = (
        q.join(c, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_parts(
                    dot_static("q_vec", "c_vec", dim),
                    F.col("q_norm"),
                    F.col("c_norm"),
                ),
                5,
            ).alias("score"),
        )
    )
    return _topk(scored, k)


def _score_pairs_arrow(pairs: DataFrame, threshold: float) -> DataFrame:
    """Arrow-vectorized exact cosine over a pair frame
    (id_a, vec_a, norm_a, id_b, vec_b, norm_b) → (id_a, id_b, score ≥ threshold).

    The quadratic pair stage is the one place embedding math earns a Python
    boundary: a numpy kernel over Arrow batches does the 64-wide multiply-add
    ~7× faster than the unrolled codegen expression (measured at sf0.1), and
    it's batched — never row-at-a-time. Float parity with the Catalyst/DuckDB
    form is engineered, not hoped for:

    * the dot product accumulates LEFT-FOLD over dimensions (a vectorized
      column loop, sequential across dims) — bit-identical to the unrolled
      ``t0 + t1 + ...`` chain and to the oracle's ``list_sum`` order;
    * inputs are cast float32→float64 per element exactly like
      ``CAST(x AS DOUBLE)``; denominators multiply/divide in IEEE double;
    * ROUNDING STAYS IN CATALYST: the kernel emits unrounded scores filtered
      at a conservative ``threshold - 1e-5`` (HALF_UP rounding can lift a
      score by at most 5e-6), and the exact ``F.round(_, 5) >= threshold``
      decision happens Spark-side — numpy's round-half-even never touches
      the result.
    """
    import numpy as np
    import pandas as pd

    guard = threshold - 1e-5

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id_a": [], "id_b": [], "score": []})
                continue
            a = np.stack(pdf["vec_a"].values).astype(np.float64)
            b = np.stack(pdf["vec_b"].values).astype(np.float64)
            acc = a[:, 0] * b[:, 0]
            for d in range(1, a.shape[1]):
                acc = acc + a[:, d] * b[:, d]  # left-fold: parity with t0+t1+…
            denom = pdf["norm_a"].values * pdf["norm_b"].values
            s = np.where(denom == 0, 0.0, acc / np.where(denom == 0, 1.0, denom))
            keep = s >= guard
            yield pd.DataFrame({
                "id_a": pdf["id_a"].values[keep],
                "id_b": pdf["id_b"].values[keep],
                "score": s[keep],
            })

    id_a_t = pairs.schema["id_a"].dataType.simpleString()
    id_b_t = pairs.schema["id_b"].dataType.simpleString()
    scored = pairs.mapInPandas(
        score, f"id_a {id_a_t}, id_b {id_b_t}, score double"
    )
    return scored.select(
        "id_a", "id_b", F.round("score", 5).alias("score")
    ).where(F.col("score") >= threshold)


def _score_buckets_grouped(banded: DataFrame, threshold: float,
                           chunk_rows: int = 1024) -> DataFrame:
    """Bucket-local pairwise cosine: one ``applyInPandas`` group per
    (band, bucket-key), each vector shipped across the Arrow boundary ONCE
    per band — O(n_bands·N) transfer instead of the O(candidate-pairs)
    a pair-frame kernel pays. Inside a group the full pairwise score matrix
    is built as 64 vectorized outer-product accumulations (LEFT-FOLD over
    dimensions, so every matrix cell is the same ``t0 + t1 + …`` chain as
    the unrolled Catalyst expression and the oracle's ``list_sum``), in
    ``chunk_rows``-row blocks so peak memory is chunk_rows × bucket_size
    doubles regardless of bucket size. Rounding stays in Catalyst exactly
    as in :func:`_score_pairs_arrow` (conservative ``threshold - 1e-5``
    numpy pre-filter, exact ``F.round(_, 5) >= threshold`` Spark-side).

    Parallelism = number of (band, key) groups — tune ``band_planes`` so
    bucket count ≫ cores at the target scale (production near-dup runs use
    8-16 planes/band → 256-65k buckets; the fixture's 2-bit keys give 4/band,
    calibrated for recall on its near-random synthetic vectors).
    """
    import numpy as np
    import pandas as pd

    guard = threshold - 1e-5

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "score": []})
        pdf = pdf.sort_values("id", kind="mergesort")
        ids = pdf["id"].values
        vecs = np.stack(pdf["vec"].values).astype(np.float64)
        norms = pdf["norm"].values
        out_a, out_b, out_s = [], [], []
        # Two-pass parity trick: a BLAS GEMM (cache-blocked, ~10× less
        # memory traffic than 64 outer-product sweeps) finds candidates at
        # a slack threshold, then the exact LEFT-FOLD chain recomputes only
        # the survivors. GEMM and left-fold disagree by ≲1e-13 relative
        # (64-term double sums), so the 1e-6 slack can only ADD candidates
        # — the emitted scores are pure left-fold, bit-identical to the
        # unrolled Catalyst expression and the oracle.
        pre_guard = guard - 1e-6
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            a = vecs[lo:hi]
            approx = a @ vecs.T
            denom = np.multiply.outer(norms[lo:hi], norms)
            s_pre = np.where(denom == 0, 0.0,
                             approx / np.where(denom == 0, 1.0, denom))
            # strict upper triangle: id_a < id_b (ids sorted, distinct)
            rows, cols = np.nonzero(
                (s_pre >= pre_guard)
                & (np.arange(n)[None, :] > (lo + np.arange(hi - lo))[:, None]))
            if len(rows) == 0:
                continue
            va, vb = vecs[rows + lo], vecs[cols]
            acc = va[:, 0] * vb[:, 0]
            for d in range(1, vecs.shape[1]):
                acc = acc + va[:, d] * vb[:, d]  # left-fold: exact parity
            dpair = denom[rows, cols]
            s = np.where(dpair == 0, 0.0,
                         acc / np.where(dpair == 0, 1.0, dpair))
            keep = s >= guard
            out_a.append(ids[rows + lo][keep])
            out_b.append(ids[cols][keep])
            out_s.append(s[keep])
        return pd.DataFrame({
            "id_a": np.concatenate(out_a) if out_a else [],
            "id_b": np.concatenate(out_b) if out_b else [],
            "score": np.concatenate(out_s) if out_s else [],
        })

    id_t = banded.schema["id"].dataType.simpleString()
    scored = banded.groupBy("band", "key").applyInPandas(
        score, f"id_a {id_t}, id_b {id_t}, score double")
    return scored.select(
        "id_a", "id_b", F.round("score", 5).alias("score")
    ).where(F.col("score") >= threshold)


def _make_block_pair_scorer(threshold: float, chunk_rows: int = 1024):
    """Pandas group-scorer for one block-pair group (the body of
    :func:`_score_block_pairs`'s ``applyInPandas``), exposed as a factory
    so property tests drive the REAL kernel on constructed frames
    (tests/test_pair_kernel_properties.py). Emits RAW left-fold scores at
    the conservative ``threshold - 1e-5`` guard; the exact
    ``round(_, 5) >= threshold`` decision stays Catalyst-side."""
    import numpy as np
    import pandas as pd

    guard = threshold - 1e-5
    pre_guard = guard - 1e-6

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf[~pdf["high"]].sort_values("id", kind="mergesort")
        hi = pdf[pdf["high"]].sort_values("id", kind="mergesort")
        empty = pd.DataFrame({"id_a": [], "id_b": [], "score": []})
        out_a, out_b, out_s = [], [], []

        def cross(ids_a, vecs_a, norms_a, ids_b, vecs_b, norms_b, diag):
            na = len(ids_a)
            for start in range(0, na, chunk_rows):
                stop = min(start + chunk_rows, na)
                a = vecs_a[start:stop]
                approx = a @ vecs_b.T
                denom = np.multiply.outer(norms_a[start:stop], norms_b)
                s_pre = np.where(denom == 0, 0.0,
                                 approx / np.where(denom == 0, 1.0, denom))
                mask = s_pre >= pre_guard
                if diag:  # strict upper triangle of the same block
                    mask &= (np.arange(len(ids_b))[None, :]
                             > (start + np.arange(stop - start))[:, None])
                rows, cols = np.nonzero(mask)
                if len(rows) == 0:
                    continue
                va, vb = vecs_a[rows + start], vecs_b[cols]
                acc = va[:, 0] * vb[:, 0]
                for d in range(1, vecs_a.shape[1]):
                    acc = acc + va[:, d] * vb[:, d]  # left-fold: parity
                dpair = denom[rows, cols]
                s = np.where(dpair == 0, 0.0,
                             acc / np.where(dpair == 0, 1.0, dpair))
                keep = s >= guard
                ia, ib = ids_a[rows + start][keep], ids_b[cols][keep]
                out_a.append(np.minimum(ia, ib))
                out_b.append(np.maximum(ia, ib))
                out_s.append(s[keep])

        # The within-lo triangle belongs to the DIAGONAL group only (hi is
        # empty exactly there); an off-diagonal group's lo side holds the
        # whole of block i, and pairing inside it would re-score every
        # same-block pair once per group it rides along to.
        if len(hi) == 0 and len(lo) >= 2:
            ids = lo["id"].values
            vecs = np.stack(lo["vec"].values).astype(np.float64)
            norms = lo["norm"].values
            cross(ids, vecs, norms, ids, vecs, norms, diag=True)
        if len(lo) >= 1 and len(hi) >= 1:
            cross(lo["id"].values,
                  np.stack(lo["vec"].values).astype(np.float64),
                  lo["norm"].values,
                  hi["id"].values,
                  np.stack(hi["vec"].values).astype(np.float64),
                  hi["norm"].values, diag=False)
        if not out_a:
            return empty
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "score": np.concatenate(out_s),
        })

    return score


def _score_block_pairs(v: DataFrame, threshold: float, n_blocks: int = 8,
                       chunk_rows: int = 1024) -> DataFrame:
    """Exact all-pairs cosine via triangular block decomposition: block =
    ``id % n_blocks``; every vector is shipped to the B block-pair groups
    its block participates in (B rows per vector), every unordered vector
    pair lands in EXACTLY one (min(block), max(block)) group, and each
    group scores its pairs with the same chunked GEMM-prefilter +
    exact-left-fold-rescore the LSH bucket kernel uses. B(B+1)/2 groups
    drive parallelism; Arrow transfer is O(B·N) rows — the crossJoin form
    this replaces shipped the full O(N²) pair frame through Arrow
    (measured 52× sf0.1→sf1 wall growth). No dedup pass is needed: block
    pairs partition the pair space."""
    # Block assignment only needs to be deterministic within the job — ANY
    # partition of the vectors yields the same pair set and scores, so an
    # engine-private hash is fine here (nothing for an oracle to replay)
    # and keeps the kernel id-type-agnostic (string ids included).
    blk = F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(n_blocks)) \
           .cast("int")
    member = v.withColumn("_b", blk).select(
        "id", "vec", "norm",
        F.explode(F.array(*[
            F.struct(
                (F.least(F.col("_b"), F.lit(j)) * n_blocks
                 + F.greatest(F.col("_b"), F.lit(j))).alias("grp"),
                (F.col("_b") > F.lit(j)).alias("high"),
            )
            for j in range(n_blocks)
        ])).alias("m"),
    ).select("id", "vec", "norm",
             F.col("m.grp").alias("grp"), F.col("m.high").alias("high"))

    score = _make_block_pair_scorer(threshold, chunk_rows)
    id_t = v.schema["id"].dataType.simpleString()
    scored = member.groupBy("grp").applyInPandas(
        score, f"id_a {id_t}, id_b {id_t}, score double")
    return scored.select(
        "id_a", "id_b", F.round("score", 5).alias("score")
    ).where(F.col("score") >= threshold)


def near_duplicate_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    exact: bool = False,
    n_bands: int = 8,
    band_planes: int = 2,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, score ≥ threshold).

    DEFAULT (``exact=False``) is the scale path: banded hyperplane LSH —
    each vector gets ``n_bands`` bucket keys of ``band_planes`` sign bits;
    candidates are pairs equal in ≥1 band (an equi-self-join, linear in
    corpus size), exact-rescored with the same cosine the brute force uses.
    No cross join anywhere — pair work is bucket-local, the shape that
    survives 100 TB. Recall tunes via (n_bands, band_planes): P(candidate) =
    1-(1-(1-θ/π)^band_planes)^n_bands. Requires ``dim``.

    ``exact=True`` is the all-pairs O(n²) brute force — the correctness
    oracle, for small corpora / differential tests only. It runs as the
    classic TRIANGULAR BLOCK decomposition (:func:`_score_block_pairs`):
    each vector joins the B block-pair groups its ``id % B`` block touches,
    every unordered pair lands in exactly one group, and each group is one
    chunked GEMM — O(B·N) rows moved instead of the crossJoin's O(N²)
    Arrow pair frame, quadratic work stays vectorized compute.

    Both paths share the GEMM-prefilter / exact-left-fold-rescore kernels,
    whose float semantics are bit-identical to the unrolled Catalyst
    expression (see :func:`_score_pairs_arrow`'s docstring).
    """
    if exact:
        v = vectors.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            l2_norm(F.col(vec_col)).alias("norm"),
        )
        return _score_block_pairs(v, threshold)

    if dim is None:
        raise ValueError("bucketed near_duplicate_pairs requires dim "
                         "(unrolled codegen projections); pass exact=True "
                         "for the dim-agnostic brute force")
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("norm"),
    )
    # One signature of n_bands·band_planes bits per vector; band b's bucket
    # key is a substring slice — the projection tree is built/compiled ONCE
    # instead of once per band.
    sig = hyperplane_signature("vec", n_bands * band_planes, dim)
    # The band table CARRIES (vec, norm): candidate generation + rescore is
    # ONE shuffle of 8 rows per vector into (band, key) groups, scored
    # bucket-locally by the grouped numpy kernel. The earlier shape — bare
    # (id_a, id_b) candidate self-join, .distinct(), two vector re-joins,
    # pair-frame rescore — shuffles and Arrow-transfers the full QUADRATIC
    # candidate set (measured 116× sf0.1→sf1 wall growth); this shape moves
    # O(n_bands·N) rows total, and the quadratic part is vectorized compute
    # inside each group. Pairs colliding in several bands are scored once
    # per band — identical scores, so the final dropDuplicates is
    # deterministic.
    banded = v.withColumn("_sig", sig).select(
        "id", "vec", "norm",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.substring("_sig", b * band_planes + 1,
                                band_planes).alias("key"),
                )
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("id", "vec", "norm",
             F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # Materialize before grouping: the 1024-term signature tree costs
    # Catalyst seconds of driver-side optimization when embedded in the
    # grouped-UDF plan; checkpointing truncates the lineage so the group
    # stage plans against a flat scan. Same pattern as the shingle index in
    # dedup_fuzzy.
    banded = banded.transform(materialize)
    return (_score_buckets_grouped(banded, threshold)
            .dropDuplicates(["id_a", "id_b"]))


def mmr_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 8,
    pool: int = 40,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_queries: int = 4096,
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein,
    SIGIR 1998) — the standard redundancy-penalized re-rank for retrieval /
    RAG context selection: greedily pick

        argmax_{d ∉ S}  λ·rel(d) − (1−λ)·max_{s ∈ S} sim(d, s)

    Output: (query_id, rnk, neighbor_id, relevance, mmr).

    Two-stage plan, matching how MMR is deployed at corpus scale:

    1. *Candidate generation* (distributed, the 100 TB part):
       :func:`brute_force_topk` exact-cosine top-``pool`` per query — query
       side broadcasts, corpus only scans; swap in the ANN paths for larger
       pools. Candidate pairwise similarities are one bounded per-query
       self-join (|Q|·pool² rows), also distributed.
    2. *Greedy selection* (bounded driver kernel): ``k`` steps over ≤
       |Q|·pool candidates — O(k·|Q|·pool) integer ops on a
       constant-bounded table, the same contract as the centroid /
       merge-table pulls elsewhere (NOT an unbounded collect; the corpus
       never leaves the cluster).

    Exactness contract: relevance and pairwise cosines are rounded to 5dp
    (the module convention), then lifted to ×1e5 bigints; the MMR objective
    is the exact integer ``lam_num·rel5 − (lam_den−lam_num)·sim5`` with
    ties broken by neighbor id — no float accumulation anywhere, so the
    selection is bit-reproducible across engines (the DuckDB oracle unrolls
    the same greedy steps as chained CTEs).

    Bounded-pull CONTRACT (not convention): the driver greedy collects
    |Q|·pool + |Q|·pool·(pool−1) rows, so |Q| is capped at ``max_queries``
    (default 4096) and checked with a limit-probe BEFORE any work — a
    caller passing an oversized query side gets a loud ``ValueError``
    instead of an unbounded collect, mirroring the loop non-convergence
    failures elsewhere. Raise ``max_queries`` explicitly to accept the
    proportional driver pull.
    """
    if not 0 < lam_num <= lam_den:
        raise ValueError(f"need 0 < lam_num <= lam_den, got {lam_num}/{lam_den}")
    if max_queries <= 0:
        raise ValueError(f"max_queries must be positive, got {max_queries}")
    # limit-probe, not a full count: one cheap job that stops scanning at
    # max_queries+1 rows regardless of the query side's true size.
    probe = queries.select(id_col).limit(max_queries + 1).count()
    if probe > max_queries:
        raise ValueError(
            f"mmr_topk: query side has > {max_queries} rows — the greedy "
            f"kernel collects |Q|*pool*(pool-1) rows to the driver, which "
            f"is only bounded if |Q| is. Pass max_queries explicitly to "
            f"accept a larger pull, or pre-aggregate the query side.")
    cand = brute_force_topk(queries, corpus, k=pool, id_col=id_col,
                            vec_col=vec_col, dim=dim)
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    pool_df = (
        cand.join(vecs, on="neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.round(F.col("score") * 100000).cast("long").alias("rel5"),
            "_v", "_n",
        )
    ).transform(materialize)
    a = pool_df.select("query_id", F.col("neighbor_id").alias("ida"),
                       F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = pool_df.select("query_id", F.col("neighbor_id").alias("idb"),
                       F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    sims = (
        a.join(b, on="query_id")
        .where(F.col("ida") != F.col("idb"))
        .select(
            "query_id", "ida", "idb",
            F.round(
                F.round(
                    cosine_from_parts(
                        _dot("_va", "_vb", dim),
                        F.col("_na"), F.col("_nb")),
                    5,
                ) * 100000
            ).cast("long").alias("sim5"),
        )
    )
    # Bounded pulls: |Q|·pool and |Q|·pool·(pool−1) rows by construction.
    pool_rows = pool_df.select("query_id", "neighbor_id", "rel5").collect()
    sim_rows = sims.collect()
    rel = {(r["query_id"], r["neighbor_id"]): r["rel5"] for r in pool_rows}
    sim = {(r["query_id"], r["ida"], r["idb"]): r["sim5"] for r in sim_rows}
    by_query: dict = {}
    for (qid, nid), r5 in rel.items():
        by_query.setdefault(qid, []).append((nid, r5))
    out_rows = []
    mu = lam_den - lam_num
    for qid, cands in by_query.items():
        selected: list = []
        remaining = dict(cands)
        for step in range(1, min(k, len(cands)) + 1):
            best = None
            for nid, r5 in remaining.items():
                if selected:
                    msim = max(sim[(qid, nid, s)] for s in selected)
                else:
                    msim = 0
                mmr_int = lam_num * r5 - mu * msim
                key = (-mmr_int, nid)
                if best is None or key < best[0]:
                    best = (key, nid, mmr_int)
            _, nid, mmr_int = best
            selected.append(nid)
            del remaining[nid]
            out_rows.append((qid, nid, step, int(mmr_int)))
    spark = corpus.sparkSession
    # Schema in the CALLERS' id dtypes (queries' id_col for query_id,
    # corpus' for neighbor_id) — the documented generic id_col contract;
    # a hardcoded long schema broke non-integer vector ids (ADVICE r11).
    from pyspark.sql.types import LongType, StructField, StructType

    picked = spark.createDataFrame(out_rows, StructType([
        StructField("query_id", queries.schema[id_col].dataType),
        StructField("neighbor_id", corpus.schema[id_col].dataType),
        StructField("rnk", LongType()),
        StructField("mmr_int", LongType()),
    ]))
    # Join back so id columns keep the corpus dtypes end-to-end.
    return (
        pool_df.select("query_id", "neighbor_id", "rel5")
        .join(picked, on=["query_id", "neighbor_id"])
        .select(
            "query_id",
            "rnk",
            "neighbor_id",
            F.round(F.col("rel5") / 100000.0, 5).alias("relevance"),
            F.round(F.col("mmr_int") / (lam_den * 100000.0), 6).alias("mmr"),
        )
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Top-k most-similar corpus vectors with a DIFFERENT label per query —
    hard-negative mining for contrastive training.

    Same scale posture as :func:`brute_force_topk` (queries broadcast, corpus
    streams, per-query window top-k); the label-mismatch predicate folds into
    the scoring pass so negatives never materialize beyond the frame the
    window prunes. Output: (query_id, neighbor_id, neg_label, score, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("q_label"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_label") != F.col("neg_label"))
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            F.round(
                cosine_from_parts(
                    _dot("q_vec", "c_vec", dim),
                    F.col("q_norm"),
                    F.col("c_norm"),
                ),
                round_digits,
            ).alias("score"),
        )
    )
    return _topk(scored, k)


def label_centroid_quality(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Per-label centroid cohesion: mean cosine of members to their label
    centroid.

    Centroids come from one posexplode → (label, pos) average — the
    component-wise mean computed as a plain hash aggregate (never a
    collect_list of whole vectors: state per group is ONE double per
    dimension, so a 100 TB corpus with a million labels is still two narrow
    shuffles). The tiny centroid table broadcasts back for the cohesion
    pass. Output: (label, n_vecs, avg_cos).
    """
    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("label"),
        F.col(vec_col).alias("vec"),
    )
    comps = (
        base.select("label", F.posexplode("vec").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )
    centroids = (
        comps.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("_pc"))
        .select(
            F.col("label").alias("c_label"),
            F.transform("_pc", lambda s: s["c"]).alias("centroid"),
        )
        .withColumn("c_norm", l2_norm(F.col("centroid")))
    )
    member_cos = (
        base.withColumn("v_norm", l2_norm(F.col("vec")))
        .join(F.broadcast(centroids), F.col("label") == F.col("c_label"))
        .select(
            "label",
            F.round(
                cosine_from_parts(
                    _dot("vec", "centroid", dim),
                    F.col("v_norm"),
                    F.col("c_norm"),
                ),
                5,
            ).alias("cos"),
        )
    )
    return member_cos.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("cos"), 5).alias("avg_cos"),
    )


def center_normalize(vectors: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Mean-center the embedding corpus and report per-row L2 norms before
    and after, plus an exact integer checksum of the centered components —
    the standard preprocessing ahead of cosine retrieval / PCA (centering
    turns cosine into Pearson correlation; public folklore, e.g.
    scikit-learn's StandardScaler-with-mean).

    The corpus mean is computed with the k-means fixed-point treatment:
    posexplode → per-dimension bigint sums of 1e-6-quantized components →
    round((Σ/1e6)/n, 6) — order-independent under partial aggregation, so
    the collected mean vector (dim rows, driver-side — the bounded
    centroid-literal class) is bit-identical cross-engine. The mean then
    rides as ONE array literal and the centering/norm math is a pure
    per-row projection: no join, no second shuffle. Norm folds are
    sequential left folds (zip-square-accumulate), matching the oracle's
    ``list_reduce`` exactly; sqrt is IEEE-correctly-rounded, so 6dp
    rounding is display-only."""
    pts = vectors.select(
        F.col(id_col).alias("pid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
    mean_rows = (
        pts.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum(F.round(F.col("x") * 1000000).cast("bigint")).alias("s"),
             F.count(F.lit(1)).alias("n"))
        .select("pos",
                F.round((F.col("s") / F.lit(1000000.0)) / F.col("n"), 6)
                .alias("m"))
        .collect()
    )
    mean = [r["m"] for r in sorted(mean_rows, key=lambda r: r["pos"])]
    from hierarchical_graph_db_spark.functions.fastlit import lit_double_array

    mean_lit = lit_double_array(mean)
    centered = F.zip_with(F.col("v"), mean_lit, lambda a, b: a - b)

    def _norm(arr) -> F.Column:
        return F.sqrt(F.aggregate(
            arr, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x))

    checksum = F.aggregate(
        centered, F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.round(x * 1000000).cast("bigint"))
    return pts.select(
        F.col("pid").alias(id_col),
        F.round(_norm(F.col("v")), 6).alias("norm_before"),
        F.round(_norm(centered), 6).alias("norm_after"),
        checksum.alias("centered_checksum"),
    )
