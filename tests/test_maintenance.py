"""Compaction tests: small-file swarm → few files, data intact, clustering
enables file-level pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.maintenance import (
    compact_parquet,
    parquet_file_count,
    table_stats,
)


def test_compaction_reduces_files_keeps_rows(spark, sf_dir, tmp_path):
    events = Catalog(spark, sf_dir).events
    frag = str(tmp_path / "fragmented")
    events.repartition(32).write.mode("overwrite").parquet(frag)
    assert parquet_file_count(frag) == 32

    out = str(tmp_path / "compacted")
    compact_parquet(spark, frag, out, target_mb=128)
    assert parquet_file_count(out) <= 2
    assert spark.read.parquet(out).count() == events.count()
    stats = table_stats(spark.read.parquet(out))
    assert stats["n_files"] <= 2 and stats["n_rows"] == events.count()


def test_clustered_compaction_tightens_ranges(spark, sf_dir, tmp_path):
    """Range-clustered rewrite: each output file covers a disjoint ts range,
    so a time predicate prunes whole files."""
    events = Catalog(spark, sf_dir).events
    frag = str(tmp_path / "frag2")
    # shuffle rows so ts is scattered across files
    events.repartition(16, "user_id").write.mode("overwrite").parquet(frag)

    out = str(tmp_path / "clustered")
    # force multiple output files regardless of tiny fixture size
    df = spark.read.parquet(frag).repartitionByRange(4, F.col("ts")) \
        .sortWithinPartitions("ts")
    df.write.mode("overwrite").parquet(out)

    files = spark.read.parquet(out).select(
        F.input_file_name().alias("f"),
        F.col("ts"),
    ).groupBy("f").agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()
    assert len(files) == 4
    spans = sorted([(r["lo"], r["hi"]) for r in files])
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # disjoint ranges → min/max pruning works

def test_zorder_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordering events on (user_id, value) must shrink per-file min/max
    spans in BOTH dimensions (1-D clustering would collapse one and leave
    the other at full width) — the property that makes min/max file
    skipping work for predicates on either column."""
    from hierarchical_graph_db_spark.operators.maintenance import zorder_compact

    src = str(tmp_path / "ev_src")
    Catalog(spark, sf_dir).events.select("event_id", "user_id", "value") \
        .write.parquet(src)
    dst = str(tmp_path / "ev_z")
    # force a multi-file layout so per-file spans are meaningful
    zorder_compact(spark, src, dst, cols=["user_id", "value"], n_files=8)

    import glob

    files = sorted(glob.glob(f"{dst}/part-*.parquet"))
    assert len(files) >= 4, "z-order write did not produce a multi-file layout"

    import pyarrow.parquet as pq

    def spans(col):
        out = []
        for f in files:
            t = pq.read_table(f, columns=[col])[col].to_pylist()
            out.append(max(t) - min(t))
        return out

    full = spark.read.parquet(src)
    import pyspark.sql.functions as F

    g = full.agg(
        (F.max("user_id") - F.min("user_id")).alias("du"),
        (F.max("value") - F.min("value")).alias("dv"),
    ).collect()[0]
    avg_u = sum(spans("user_id")) / len(files)
    avg_v = sum(spans("value")) / len(files)
    # each file's bounding box should be well under the global extent in
    # BOTH dims (Z-curve locality); 0.75 is a loose, load-independent bar
    assert avg_u < 0.75 * g["du"], (avg_u, g["du"])
    assert avg_v < 0.75 * g["dv"], (avg_v, g["dv"])
    assert spark.read.parquet(dst).count() == full.count()


def test_file_skipping_stats_zorder_beats_linear(spark):
    """On a uniform 2-D grid, a box constrained in BOTH dims prunes far
    better under Z-tiles than under x-only clustering: the linear layout
    must scan every x-matching file across all y, the Z layout only the
    tiles intersecting the box."""
    from pyspark.sql import functions as F
    from hierarchical_graph_db_spark.operators.maintenance import (
        file_skipping_stats,
    )

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("gx"), (F.col("id") / 64).cast("long").alias("gy"))
    out = {r["layout"]: r for r in file_skipping_stats(
        grid, x=F.col("gx"), y=F.col("gy"), box=(8, 15, 8, 15),
        bits=6).collect()}
    lin, z = out["linear"], out["zorder"]
    assert lin["n_files"] == 64 and z["n_files"] == 64
    # linear: the 8 files x∈[8,15] all contain full y range → all candidates
    assert lin["n_candidate_files"] == 8 and lin["rows_candidate"] == 8 * 64
    # zorder: the aligned 8×8 box is exactly ONE 64-cell tile
    assert z["n_candidate_files"] == 1 and z["rows_candidate"] == 64
    assert z["skip_fraction"] > lin["skip_fraction"]


def test_incremental_join_delta_equals_recompute(spark):
    """Appending the delta to the old view must equal the full recompute
    as a MULTISET (duplicate join keys included) — and the ΔA⋈ΔB overlap
    must be counted exactly once."""
    from hierarchical_graph_db_spark.operators.maintenance import (
        incremental_join_delta,
    )
    from pyspark.sql import functions as F

    sa = spark.createDataFrame([(1, "a1"), (2, "a2"), (2, "a2x")],
                               "k: bigint, va: string")
    da = spark.createDataFrame([(2, "a3"), (3, "a4")], "k: bigint, va: string")
    sb = spark.createDataFrame([(1, "b1"), (2, "b2")], "j: bigint, vb: string")
    db = spark.createDataFrame([(2, "b3"), (3, "b4")], "j: bigint, vb: string")
    cond = F.col("k") == F.col("j")
    delta = incremental_join_delta(sa, da, sb, db, cond)
    old = sa.join(sb, cond)
    new = sa.unionByName(da).join(sb.unionByName(db), cond)

    def bag(df):
        out = {}
        for r in df.collect():
            t = (r["k"], r["va"], r["vb"])
            out[t] = out.get(t, 0) + 1
        return out

    combined = bag(old)
    for t, n in bag(delta).items():
        combined[t] = combined.get(t, 0) + n
    assert combined == bag(new)
