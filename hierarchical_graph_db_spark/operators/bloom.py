"""Bloom-filter semi-join pruning (Bloom 1970, public method).

The classic distributed-join reduction: when the build side of a join is too
big to broadcast *as rows* but its KEY SET compresses to a few kilobytes of
bitmap, ship the bitmap instead — every probe row tests its key against the
filter before the shuffle, so the exchange moves only rows that can possibly
match (plus a bounded false-positive fraction the exact join then removes).
Spark's own runtime bloom-filter join (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) applies the same idea adaptively; this operator is the
explicit, engine-level form with deterministic hashes so the pruning step is
reproducible cross-engine and the equivalence oracle (result == plain join)
can be hash-checked.

Scale shape:
* build pass — one distinct + one hash aggregate over ``m/64`` word keys:
  partials collapse map-side (bit_or is idempotent/commutative), the
  exchange moves O(m/64) rows regardless of build size, and the collected
  bitmap is m bits (default 64 Kib = 8 KiB) — the bounded-collect class;
* probe pass — the membership test is a pure expression over an
  array<bigint> literal (two sha2 slices, two word lookups): no join, no
  exchange, evaluated inside the probe scan's project, so the downstream
  join's shuffle shrinks by the filter's selectivity;
* correctness — Bloom filters have NO false negatives, so
  ``join(prefiltered_probe, build) == join(probe, build)`` exactly; the
  false-positive rate only costs wasted shuffle (~(1-e^{-jn/m})^j).

Determinism: positions come from non-overlapping hex slices of ONE
``sha2(key, 256)`` per row — data-independent of partitioning, identical on
any engine that replays the slices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# 2^b as a signed-bigint literal table (b=63 wraps to Long.MIN_VALUE, the
# sign bit) — Spark's shiftleft() only takes a Python-int shift amount, so
# column-valued bit masks come from an element_at over this 64-entry array.
_POW2 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _mask(pos: Column) -> Column:
    """Single-bit bigint mask for bit ``pos % 64``."""
    return F.element_at(F.lit(_POW2),
                        (F.pmod(pos, F.lit(64)) + 1).cast("int"))


def _positions(key: Column, m_bits: int, n_hashes: int,
               hash_family: str = "xxhash64") -> list[Column]:
    """``n_hashes`` bit positions in [0, m_bits).

    ``hash_family="xxhash64"`` (default): position i = pmod(xxhash64(key,
    i), m) — a native codegen'd hash, ~2 orders of magnitude cheaper per
    probe row than the sha2 path (measured: the probe scan's project
    dominated bloom_prune_join's wall; guide §4.1 "prefer built-ins").
    Deterministic and partition-independent within Spark, which is all the
    equivalence contract needs: a Bloom filter has no false negatives under
    ANY hash family, so join(pruned, build) == join(probe, build) exactly,
    and only that joined result is hash-checked.

    ``hash_family="sha2"``: the original cross-engine-replayable slices —
    hash i reads hex chars [15i+1, 15i+15] (60 bits < bigint) of one
    sha256, mod m. Keep for callers that need a SQL engine to rebuild the
    identical bitmap (n_hashes ≤ 4)."""
    if hash_family == "sha2":
        if n_hashes > 4:
            raise ValueError("n_hashes > 4 would overrun the sha256 hex digest")
        digest = F.sha2(key.cast("string"), 256)
        return [
            F.pmod(
                F.conv(F.substring(digest, 1 + 15 * i, 15), 16, 10)
                .cast("bigint"),
                F.lit(m_bits),
            )
            for i in range(n_hashes)
        ]
    if hash_family != "xxhash64":
        raise ValueError(f"unknown hash_family {hash_family!r}")
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(n_hashes)
    ]


def build_bitmap(build: DataFrame, key: str, m_bits: int = 65536,
                 n_hashes: int = 2,
                 hash_family: str = "xxhash64") -> list[int]:
    """The build side's key set as an m-bit Bloom bitmap, returned as
    ``m_bits/64`` Python ints (the literal the probe side bakes into its
    plan). One distinct + one O(m/64)-row bit_or aggregate; the collect is
    the bitmap, never build rows."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    keys = build.select(F.col(key).alias("k")).where(F.col("k").isNotNull())
    pos = keys.distinct().select(
        F.explode(F.array(*_positions(F.col("k"), m_bits, n_hashes,
                                      hash_family)))
        .alias("pos"))
    words = (
        pos.select((F.col("pos") / 64).cast("bigint").alias("word"),
                   _mask(F.col("pos")).alias("bit"))
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_might_contain(key: Column, bitmap: list[int], m_bits: int,
                        n_hashes: int = 2,
                        hash_family: str = "xxhash64") -> Column:
    """Membership-test expression against the bitmap literal: true iff every
    hash position's bit is set. Pure projection — no join, no exchange."""
    # Bigints keep Java's sign bit: compare the masked word to the mask
    # itself (!= 0 breaks on bit 63 where the mask is negative).
    lit = F.lit(bitmap)
    cond = None
    for pos in _positions(key, m_bits, n_hashes, hash_family):
        word = F.element_at(lit, ((pos / 64).cast("bigint") + 1).cast("int"))
        mask = _mask(pos)
        hit = word.bitwiseAND(mask) == mask
        cond = hit if cond is None else cond & hit
    return cond


def bloom_prune(probe: DataFrame, probe_key: str, build: DataFrame,
                build_key: str, m_bits: int = 65536,
                n_hashes: int = 2,
                hash_family: str = "xxhash64") -> DataFrame:
    """``probe`` reduced to rows whose key *might* appear in ``build``'s key
    set (no false negatives; FP fraction ~(1-e^{-jn/m})^j only costs
    shuffle). Compose with the exact join for identical-to-plain-join
    results at a fraction of the exchange volume."""
    bitmap = build_bitmap(build, build_key, m_bits, n_hashes, hash_family)
    return probe.where(
        bloom_might_contain(F.col(probe_key), bitmap, m_bits, n_hashes,
                            hash_family))
