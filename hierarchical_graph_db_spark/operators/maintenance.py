"""Table maintenance: small-file compaction and clustered rewrites.

Streaming ingest (micro-batch appends) and wide-parallelism writes both
produce small-file swarms; at 100 TB a scan's task count — and the
NameNode/listing pressure — is set by file count, not data size. Compaction
rewrites a parquet dataset into ~``target_mb`` files; with ``cluster_by`` it
additionally range-clusters rows so min/max row-group pruning works for the
clustered columns (the poor man's Z-order, right for a single dominant
predicate column like event time).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dataset_bytes(path: str) -> int:
    """Total bytes under a local dataset path (driver-side walk; on a real
    cluster this comes from the FileSystem API / catalog stats)."""
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` with ~target_mb output files.

    Returns the number of output files requested. ``cluster_by`` uses
    ``repartitionByRange`` + in-partition sort so each output file covers a
    tight range of the cluster key (scan pruning on that key skips whole
    files thereafter).
    """
    df = spark.read.parquet(src_path)
    n_files = max(1, math.ceil(dataset_bytes(src_path) / (target_mb * 1024 * 1024)))
    if cluster_by:
        cols = [F.col(c) for c in cluster_by]
        df = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst_path)
    return n_files


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def table_stats(df: DataFrame) -> dict[str, int]:
    """Cheap stats for maintenance decisions (row count + scan file count)."""
    return {"n_rows": df.count(), "n_files": len(df.inputFiles())}


def zorder_value(a: F.Column, b: F.Column, bits: int = 8) -> F.Column:
    """Interleave the low ``bits`` of two non-negative ints → Z-curve index.

    Unrolled shift/mask arithmetic (2·bits terms) — a flat codegen
    expression, no UDF. Points close on the Z-curve are close in BOTH
    dimensions, so range-partitioning by this value gives every output
    file a tight bounding box in (a, b) — min/max file skipping works for
    predicates on either column, which 1-D clustering can't do.
    """
    terms = []
    for i in range(bits):
        bit_a = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(bit_a, 2 * i + 1))
        terms.append(F.shiftleft(bit_b, 2 * i))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    cols: list[str],
    bits: int = 8,
    target_mb: int = 128,
    n_files: int | None = None,
) -> int:
    """Rewrite ``src_path`` Z-ordered on two numeric columns.

    Each column is normalized to rank-space [0, 2^bits) with equi-width
    scaling off an in-plan global min/max (a 1-row broadcast — no driver
    stats pass), the Z-value interleaves them, and the write is
    ``repartitionByRange`` + in-partition sort on the Z-value — the
    Databricks ZORDER analog in three Catalyst expressions.
    """
    if len(cols) != 2:
        raise ValueError("zorder_compact clusters exactly two columns")
    df = spark.read.parquet(src_path)
    a, b = (F.col(c).cast("double") for c in cols)
    bounds = df.agg(
        F.min(a).alias("_amin"), F.max(a).alias("_amax"),
        F.min(b).alias("_bmin"), F.max(b).alias("_bmax"),
    )
    top = float(2**bits - 1)

    def _norm(v, lo, hi):
        span = F.when(F.col(hi) == F.col(lo), F.lit(1.0)) \
            .otherwise(F.col(hi) - F.col(lo))
        return F.least(F.floor((v - F.col(lo)) * top / span), F.lit(top)) \
            .cast("long")

    if n_files is None:
        n_files = max(
            1, math.ceil(dataset_bytes(src_path) / (target_mb * 1024 * 1024)))
    z = zorder_value(_norm(a, "_amin", "_amax"), _norm(b, "_bmin", "_bmax"),
                     bits=bits)
    (
        df.join(F.broadcast(bounds))
        .withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", "_amin", "_amax", "_bmin", "_bmax")
        .write.mode("overwrite").parquet(dst_path)
    )
    return n_files


def file_skipping_stats(df: DataFrame, x: F.Column, y: F.Column,
                        box: tuple[int, int, int, int],
                        bits: int = 6) -> DataFrame:
    """Min/max file-skipping selectivity of a 2-D box predicate under two
    storage layouts — the measurable WHY behind :func:`zorder_compact`:

    * ``linear`` — files clustered by ``x`` alone (one file per x cell):
      perfect pruning on x, none on y;
    * ``zorder`` — files = contiguous Z-curve ranges of ``2^bits`` cells
      (each file an aligned 2^(bits/2) × 2^(bits/2) tile), so every file
      has a tight bounding box in BOTH dimensions.

    For each layout: assign every row its file id (pure arithmetic — no
    sort, no window; the real write path is ``repartitionByRange`` on the
    same keys), aggregate per-file min/max of x and y (the parquet
    footer stats a reader would consult), then count the files whose
    bounding box intersects ``box = (x_lo, x_hi, y_lo, y_hi)``. Returns one
    row per layout: (layout, n_files, n_candidate_files, rows_total,
    rows_candidate, skip_fraction 6dp). Both passes are two-phase hash
    aggregates over ≤2^(2·bits) file groups — stats collection at 100 TB
    is one map-side-collapsing scan, and the skip decision touches only
    the file-stats table."""
    cells = F.lit(2 ** bits)
    x_lo, x_hi, y_lo, y_hi = box
    assigned = df.select(
        x.cast("long").alias("x"), y.cast("long").alias("y"),
        x.cast("long").alias("file_lin"),
        F.floor(zorder_value(x.cast("long"), y.cast("long"), bits=bits)
                / cells).alias("file_z"),
    )

    def _layout(file_col: str, name: str) -> DataFrame:
        stats = (
            assigned.groupBy(F.col(file_col).alias("file_id"))
            .agg(F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                 F.min("y").alias("min_y"), F.max("y").alias("max_y"),
                 F.count(F.lit(1)).alias("n_rows"))
        )
        cand = (
            (F.col("min_x") <= x_hi) & (F.col("max_x") >= x_lo)
            & (F.col("min_y") <= y_hi) & (F.col("max_y") >= y_lo)
        )
        return stats.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(cand.cast("long")).alias("n_candidate_files"),
            F.sum("n_rows").alias("rows_total"),
            F.sum(F.when(cand, F.col("n_rows")).otherwise(0))
            .alias("rows_candidate"),
        ).select(
            "layout", "n_files", "n_candidate_files", "rows_total",
            "rows_candidate",
            F.round(1 - F.col("rows_candidate") / F.col("rows_total"), 6)
            .alias("skip_fraction"),
        )

    return _layout("file_lin", "linear").unionAll(_layout("file_z", "zorder"))


def incremental_join_delta(state_a: DataFrame, delta_a: DataFrame,
                           state_b: DataFrame, delta_b: DataFrame,
                           on) -> DataFrame:
    """Insert-only delta of a materialized JOIN view (classic incremental
    view maintenance — Blakeley et al. 1986, public method):

        Δ(A ⋈ B) = ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB

    — every new join row involves a new A row (first term, joined against
    the NEW B so ΔA⋈ΔB is included once) or an old A row meeting a new B
    row (second term). Appending the result to the stored view equals
    recomputing the join from scratch (multiset semantics; the equivalence
    is the registry oracle's EXCEPT ALL check).

    Scale shape: maintenance costs O(|Δ| ⋈) — each delta joins against the
    other side's state — never O(|state|²) recompute. With the state
    tables bucketed on the join key (tests/test_storage_layout.py) the
    delta joins are exchange-free on the state side; the deltas themselves
    are micro-batch sized. This is the join-view counterpart of the
    incremental AGGREGATE maintenance in streaming/continuous_aggregate.py.
    """
    return delta_a.join(state_b.unionByName(delta_b), on).unionByName(
        state_a.join(delta_b, on))


# --- CDC changelog apply (lakehouse MERGE semantics) -------------------------

def changelog_net(changes: DataFrame, keys: list[str], seq_col: str,
                  op_col: str, carry_seq: bool = False) -> DataFrame:
    """Collapse a changelog to its NET effect per key: the change with the
    highest ``(seq, op)`` wins (last-writer-wins; ``(seq, op)`` must be
    unique per key — the caller's sequencing contract, same as Debezium's
    LSN ordering). One ``max_by`` hash aggregate: partials collapse
    map-side, so a billion-row changelog nets down before it shuffles —
    the exchange moves one row per DISTINCT key, not per change.

    With ``carry_seq`` the winner's sequence rides along in the output
    (keys, op, seq, values) — what the streaming CDC sink needs to keep
    per-row versions in the store for cross-batch conflict resolution."""
    val_cols = [c for c in changes.columns
                if c not in (*keys, seq_col, op_col)]
    order_key = F.struct(F.col(seq_col), F.col(op_col))
    payload = F.struct(F.col(op_col).alias("op"),
                       *([F.col(seq_col).alias(seq_col)] if carry_seq
                         else []),
                       *[F.col(c).alias(c) for c in val_cols])
    net = (changes.groupBy(*keys)
           .agg(F.max_by(payload, order_key).alias("_net")))
    carried = [F.col(f"_net.{seq_col}").alias(seq_col)] if carry_seq else []
    return net.select(*keys, F.col("_net.op").alias(op_col), *carried,
                      *[F.col(f"_net.{c}").alias(c) for c in val_cols])


def apply_changelog(base: DataFrame, changes: DataFrame, keys: list[str],
                    seq_col: str = "seq", op_col: str = "op") -> DataFrame:
    """Apply an insert/update/delete changelog to a snapshot — the batch
    MERGE INTO of the lakehouse pattern (Armbrust et al. 2020, Delta Lake,
    public method), with upsert semantics: ``I``/``U`` on an existing key
    replaces it, ``U`` on an absent key inserts (whenNotMatched → insert),
    ``D`` removes the key (a no-op if absent). The changelog is first
    netted per key via :func:`changelog_net`, so multiple changes to one
    key resolve last-writer-wins before touching the base.

    Scale shape: one map-side-collapsing aggregate over the changelog +
    one key-partitioned LEFT ANTI join of base against the (tiny, netted)
    change set + a union — O(|base| + |changes|), never a recompute. With
    the base bucketed on ``keys`` (tests/test_storage_layout.py) the anti
    join is exchange-free on the base side; at micro-batch scale the netted
    side broadcasts (AQE picks this up from its post-agg size).
    """
    net = changelog_net(changes, keys, seq_col, op_col)
    upserts = net.where(F.col(op_col) != F.lit("D")).drop(op_col)
    survivors = base.join(net.select(*keys), keys, "left_anti")
    return survivors.unionByName(upserts.select(*base.columns))


def agg_view_changelog_delta(base: DataFrame, changes: DataFrame,
                             keys: list[str], group_col: str,
                             measure_col: str, seq_col: str = "seq",
                             op_col: str = "op") -> DataFrame:
    """Per-group (Δcount, Δsum) of a GROUP BY view under an I/U/D changelog
    — incremental aggregate maintenance WITH RETRACTIONS (Gupta & Mumick
    1995's counting algorithm, public method): adding the returned deltas
    to the old view equals recomputing it over the applied state, including
    rows that MOVE between groups when an update changes ``group_col``.

    Each netted change contributes up to two signed rows — a retraction
    ``(old_group, -1, -old_measure)`` when the key existed in the base, and
    an addition ``(new_group, +1, +new_measure)`` unless it is a delete —
    built as a 2-element array of structs, exploded, and hash-aggregated.
    Scale shape: the netted changelog joins the base on its key (LEFT, to
    fetch the retracted old row — co-partitioned with a bucketed base),
    then one map-side-collapsing aggregate over groups; the base is never
    re-aggregated. ``measure_col`` must be exactly representable for the
    signed sums — pass a cents/bigint column, not raw doubles."""
    net = changelog_net(changes, keys, seq_col, op_col)
    old = base.select(*keys, F.col(group_col).alias("_old_g"),
                      F.col(measure_col).alias("_old_m"))
    j = net.join(old, keys, "left")
    retract = F.when(
        F.col("_old_g").isNotNull(),
        F.struct(F.col("_old_g").alias("g"),
                 F.lit(-1).cast("bigint").alias("dc"),
                 (-F.col("_old_m")).cast("bigint").alias("dm")))
    add = F.when(
        F.col(op_col) != F.lit("D"),
        F.struct(F.col(group_col).alias("g"),
                 F.lit(1).cast("bigint").alias("dc"),
                 F.col(measure_col).cast("bigint").alias("dm")))
    return (
        j.select(F.explode(
            F.filter(F.array(retract, add), lambda x: x.isNotNull()))
            .alias("d"))
        .groupBy(F.col("d.g").alias(group_col))
        .agg(F.sum("d.dc").alias("d_count"), F.sum("d.dm").alias("d_sum"))
        .where((F.col("d_count") != 0) | (F.col("d_sum") != 0))
    )
