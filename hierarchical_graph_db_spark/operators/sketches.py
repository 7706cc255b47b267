"""Count-min sketch: sublinear frequency estimation over a keyed stream.

The sketch is a (depth × width) counter grid; every occurrence increments
one cell per row (column chosen by a per-row hash of the item), and an
item's estimate is the MIN over its depth cells — always ≥ the true count,
inflated only by collisions (≈ N/width expected per row).

Scale shape: the build is ONE hash aggregate over (row, col) — at most
depth × width result rows regardless of input size, the textbook
sublinear-state sketch for 100 TB streams. The hash family is the repo's
portable salted-sha256 (``uniform16``), so unlike engine-native sketch
bits (HLL), the DuckDB oracle replays the whole grid bit-exactly — a
sketch with a full hash-check, not just an error bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.training import uniform16

CMS_SALT = "cms-v1"


def _cell(item: F.Column, r: int, width: int, salt: str) -> F.Column:
    """Column index of ``item`` in sketch row ``r``."""
    return (uniform16(item, f"{salt}|{r}") % width).cast("int")


def cms_build(items: DataFrame, item_col: str, width: int = 256,
              depth: int = 4, salt: str = CMS_SALT) -> DataFrame:
    """Build the sketch: (r, col, c) — at most depth×width rows.

    One explode (depth structs per occurrence — constant fan-out) into one
    hash aggregate; partial aggregation collapses each partition to ≤
    depth×width rows before the shuffle, so shuffle volume is independent
    of input size.
    """
    item = F.col(item_col)
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"), _cell(item, r, width, salt).alias("col"))
        for r in range(depth)
    ])
    return (
        items.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, item_col: str,
                 width: int = 256, depth: int = 4,
                 salt: str = CMS_SALT) -> DataFrame:
    """Estimate each probe item's count: min over its depth cells.

    The sketch is tiny by construction — broadcast it; the probe side
    explodes to depth rows each and one hash aggregate takes the min.
    Output: (item, est_n). Empty cells count as 0 (left join + coalesce),
    so a probe absent from the data estimates 0 unless EVERY one of its
    depth cells collides with data — exact count-min semantics, not
    min-over-populated-cells.
    """
    item = F.col(item_col)
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"), _cell(item, r, width, salt).alias("col"))
        for r in range(depth)
    ])
    probe_cells = probes.select(
        item.alias("item"), F.explode(cells).alias("rc")
    ).select("item", F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
    return (
        probe_cells.join(F.broadcast(sketch), ["r", "col"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet-Fuss-Gandouet-Meunier 2007, public algorithm)
# ---------------------------------------------------------------------------

HLL_SALT = "hll-v1"
HLL_M = 1024  # default registers (p = 10, rsd ≈ 1.04/√1024 = 3.25%)
# h is 15 sha256 nibbles = 60 bits: p register bits + (60-p) rank bits. All
# integer arithmetic (the 2^-M_j sum is the EXACT integer Σ 2^(R+1-M_j)
# over registers, empty registers contributing 2^(R+1)), so both engines
# reach the same doubles before the single division.
_HLL_MS = (64, 256, 1024)


def hll_alpha(m: int) -> float:
    """Bias-correction constant per Flajolet et al. 2007 (Fig. 3)."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m))


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str],
                  m: int = HLL_M) -> DataFrame:
    """Per-group HLL register table (group_cols..., reg, m_j) — the
    MERGEABLE sketch partial. Register tables are the materialization
    format at 100 TB: persist them at fine grain (e.g. per day), then any
    coarser distinct-count rolls up via :func:`hll_merge` from ≤ m rows
    per fine group, never re-touching the raw data. Merging is a plain
    ``max`` per register, so partials compose associatively across
    partitions, files, and time."""
    if m not in _HLL_MS:
        raise ValueError(f"oracle replay supports m in {_HLL_MS}, got {m}")
    p = m.bit_length() - 1
    r1 = 60 - p + 1  # rank values are 1..r1
    hexs = F.sha2(
        F.concat_ws("|", F.lit(HLL_SALT), F.col(key_col).cast("string")), 256
    )
    h = F.conv(F.substring(hexs, 1, 15), 16, 10).cast("long")
    v = F.shiftright(h, p)  # 60-p rank bits
    rho = F.when(v == 0, F.lit(r1)).otherwise(
        F.lit(r1) - F.length(F.conv(v, 10, 2))
    )
    return (
        df.select(*group_cols, F.pmod(h, F.lit(m)).alias("reg"),
                  rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables down to coarser groups: max per register —
    the associative union that makes HLL partials pre-aggregable."""
    return regs.groupBy(*group_cols, "reg").agg(
        F.max("m_j").alias("m_j"))


def hll_estimate(regs: DataFrame, group_cols: list[str],
                 m: int = HLL_M) -> DataFrame:
    """Fold a register table to (group_cols..., est_users): exact integer
    Σ 2^(r1-M_j) then one division; linear counting in the small range."""
    if m not in _HLL_MS:
        raise ValueError(f"oracle replay supports m in {_HLL_MS}, got {m}")
    p = m.bit_length() - 1
    r1 = 60 - p + 1
    two_top = 1 << r1  # empty register's Σ contribution; m·2^r1 = 2^61 < 2^63
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        # pyspark's shiftleft() only takes a literal bit count — the
        # column-shift form needs the SQL expression
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"{r1} - m_j)")).alias("s_present"),
    )
    zeros = F.lit(m) - F.col("n_present")
    s_total = (F.col("s_present") + zeros * F.lit(two_top)).cast("double")
    raw = F.lit(hll_alpha(m) * m * m * float(two_top)) / s_total
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per.select(*group_cols, F.round(est, 4).alias("est_users"))


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str],
                 m: int = HLL_M) -> DataFrame:
    """Deterministic HyperLogLog distinct-count of ``key_col`` per group.

    Unlike ``approx_count_distinct`` (engine-private xxhash64 registers,
    rows-only checkable), this sketch hashes with the repo's portable
    sha256 convention, so a SQL oracle replays every register and the
    estimate hash-matches across engines — the CMS treatment applied to
    cardinality. Scale shape: one hash aggregate to ≤ m rows per group
    (map-side collapsed), then a per-group fold; shuffle volume is
    O(groups × m) regardless of input size.

    ``m`` ∈ {64, 256, 1024} (p = 6/8/10; rsd 13%/6.5%/3.25%) — wide enough
    at the default that the portable sketch IS the production form, not a
    demo beside ``approx_count_distinct``. Small-range correction (linear
    counting) per the HLL paper; the 32-bit-hash large-range correction is
    unnecessary with ≥50 rank bits. Composition of
    :func:`hll_registers` → :func:`hll_estimate`; insert
    :func:`hll_merge` between them to roll up persisted partials.
    """
    return hll_estimate(hll_registers(df, key_col, group_cols, m),
                        group_cols, m)


def sample_quantiles(df: DataFrame, value_col: str, group_cols: list[str],
                     key_col: str, rate: float = 0.25,
                     qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                     salt: str = "squant") -> DataFrame:
    """Quantile estimation over a DETERMINISTIC hash sample — the
    bounded-state alternative to an exact per-group sort (sample-based
    quantile estimation is classic; rank error concentrates as
    O(1/sqrt(rate·n)) by DKW). Keep iff ``uniform16(key) < floor(rate·
    65536)`` — the repo's bit-exact salted-u16 reproducibility contract
    (same corpus + salt ⇒ same sample on any engine, any partitioning), so
    unlike ``percentile_approx`` (engine-private t-digest, rows-only
    checkable) the whole estimate hash-replays in SQL.

    Scale shape: the sample predicate evaluates inside the scan (the
    filter is a pure projection of the key — no shuffle, no state), the
    exact interpolated percentile then sorts rate·|group| rows per group
    instead of |group|. Samples are trivially mergeable (union), so
    per-shard samples roll up like the HLL register tables. Accuracy vs
    the full-data exact quantiles is bounded in tests/test_sketches.py.
    """
    from hierarchical_graph_db_spark.operators.training import uniform16

    thresh = int(rate * 65536)
    sample = df.where(uniform16(F.col(key_col), salt) < F.lit(thresh))
    aggs = [F.count(F.lit(1)).alias("n_sample")]
    for q in qs:
        pct = int(round(q * 100))
        aggs.append(
            F.round(F.expr(f"percentile({value_col}, CAST({q} AS DOUBLE))"),
                    4).alias(f"p{pct}"))
    return sample.groupBy(*group_cols).agg(*aggs)
