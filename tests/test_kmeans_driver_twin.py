"""Differential pins for the round-15 driver-twin sampled trainers:
``kmeans_centroid_rows(driver_train=True)`` and
``pq_codebooks(driver_train=True)`` must be BIT-identical to the fully
distributed cadence (``driver_train=False``) — the same discipline as the
graph hybrid finishes' ``small_cutoff=0`` differentials (round 14).

Covers both the use_arrow and pure-expression distributed paths (they are
themselves pinned equal by test_arrow_fastpath), fixture data and an
adversarial random corpus (negative components, near-tie distances, a
sample smaller than / equal to / larger than the corpus).
"""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from hierarchical_graph_db_spark.operators.clustering import (
    kmeans_centroid_rows,
)
from hierarchical_graph_db_spark.operators.pq import pq_codebooks

SCHEMA = StructType([
    StructField("vec_id", LongType(), False),
    StructField("embedding", ArrayType(DoubleType(), False), False),
])


def _bits_rows(rows):
    return [(cid, [struct.pack("d", x) for x in c]) for cid, c in rows]


def _bits_books(books):
    return [[[struct.pack("d", x) for x in c] for c in b] for b in books]


def _random_corpus(spark, n: int, dim: int, seed: int):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-3, 3) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("n,train_sample,k,n_rounds", [
    (400, 100, 7, 2),    # sample < corpus: pass B binds
    (120, 200, 5, 3),    # sample > corpus: pass B empty on the remainder
    (64, 64, 8, 2),      # sample == corpus
])
def test_kmeans_twin_random(spark, n, train_sample, k, n_rounds):
    df = _random_corpus(spark, n, 16, seed=n)
    twin = kmeans_centroid_rows(df, k=k, n_rounds=n_rounds,
                                train_sample=train_sample, driver_train=True)
    for use_arrow in (False, True):
        dist = kmeans_centroid_rows(df, k=k, n_rounds=n_rounds,
                                    train_sample=train_sample,
                                    use_arrow=use_arrow, driver_train=False)
        assert _bits_rows(twin) == _bits_rows(dist)


@pytest.mark.parametrize("m,ksub,n_rounds,oversample", [
    (4, 8, 2, 4),
    (2, 4, 3, 8),
])
def test_pq_twin_random(spark, m, ksub, n_rounds, oversample):
    df = _random_corpus(spark, 300, 16, seed=m * 100 + ksub)
    twin = pq_codebooks(df, dim=16, m=m, ksub=ksub, n_rounds=n_rounds,
                        oversample=oversample, train_sample=128,
                        driver_train=True)
    for use_arrow in (False, True):
        dist = pq_codebooks(df, dim=16, m=m, ksub=ksub, n_rounds=n_rounds,
                            oversample=oversample, train_sample=128,
                            use_arrow=use_arrow, driver_train=False)
        assert _bits_books(twin) == _bits_books(dist)


def test_kmeans_twin_fixture(spark, sf_dir):
    from hierarchical_graph_db_spark.io import Catalog

    emb = Catalog(spark, sf_dir).embeddings
    twin = kmeans_centroid_rows(emb, k=10, n_rounds=2, train_sample=10_000,
                                driver_train=True)
    dist = kmeans_centroid_rows(emb, k=10, n_rounds=2, train_sample=10_000,
                                use_arrow=True, driver_train=False)
    assert _bits_rows(twin) == _bits_rows(dist)


def test_pq_twin_fixture(spark, sf_dir):
    from hierarchical_graph_db_spark.io import Catalog

    emb = Catalog(spark, sf_dir).embeddings
    twin = pq_codebooks(emb, dim=64, m=4, ksub=8, n_rounds=2, oversample=4,
                        driver_train=True)
    dist = pq_codebooks(emb, dim=64, m=4, ksub=8, n_rounds=2, oversample=4,
                        use_arrow=True, driver_train=False)
    assert _bits_books(twin) == _bits_books(dist)
