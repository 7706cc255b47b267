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
