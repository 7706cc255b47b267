"""Bloom-filter semi-join pruning (operators/bloom.py).

The equivalence oracle (bloom_prune_join == plain join) lives in the
registry; these tests pin the filter-level contracts the oracle can't see:
zero false negatives at every bit position (including the bigint sign bit),
real pruning of non-matching probes, and the bounded bitmap build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.bloom import (
    _POW2,
    bloom_might_contain,
    bloom_prune,
    build_bitmap,
)


def test_pow2_table_covers_sign_bit():
    assert len(_POW2) == 64
    assert _POW2[0] == 1
    assert _POW2[62] == 1 << 62
    assert _POW2[63] == -(1 << 63)  # Long.MIN_VALUE — the signed bit-63 mask


def test_no_false_negatives_dense_single_word(spark):
    # m=64 crams every position into ONE signed word: with 40 keys × 2
    # hashes, high bits (incl. bit 63) are virtually guaranteed set, so a
    # sign-handling bug in the mask comparison would surface here.
    build = spark.range(40).select(F.col("id").alias("k"))
    bitmap = build_bitmap(build, "k", m_bits=64, n_hashes=2)
    assert len(bitmap) == 1 and bitmap[0] != 0
    assert bitmap[0] < 0, "expected the sign bit set in a dense 64-bit filter"
    hits = build.select(
        bloom_might_contain(F.col("k"), bitmap, 64, 2).alias("hit"))
    assert all(r["hit"] for r in hits.collect())


def test_no_false_negatives_and_pruning(spark):
    build = spark.range(50).select((F.col("id") * 7).alias("k"))
    probe = spark.range(5000).select(F.col("id").alias("k"))
    pruned = bloom_prune(probe, "k", build, "k", m_bits=65536, n_hashes=2)
    kept = {r["k"] for r in pruned.collect()}
    member = {i * 7 for i in range(50)} & set(range(5000))
    assert member <= kept, "Bloom filter dropped a true member"
    # 100 member keys' worth of bits in 64 Ki → FP rate ≪ 1%; the prune must
    # actually prune (the whole point), not pass everything through.
    assert len(kept) < 5000 * 0.05


def test_bitmap_is_bounded(spark):
    build = spark.range(10_000).select(F.col("id").alias("k"))
    bitmap = build_bitmap(build, "k", m_bits=4096, n_hashes=2)
    assert len(bitmap) == 4096 // 64


def test_null_build_keys_ignored(spark):
    build = spark.createDataFrame([(1,), (None,)], "k: bigint")
    bitmap = build_bitmap(build, "k", m_bits=4096, n_hashes=2)
    probe = spark.createDataFrame([(1,), (2,)], "k: bigint")
    kept = {r["k"] for r in bloom_prune(probe, "k", build, "k",
                                        m_bits=4096).collect()}
    assert 1 in kept
