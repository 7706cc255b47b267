"""SparkSession construction with scale-aware defaults.

Local testing runs ``local[N]``; the same builder config is what we would ship
to a 1000-executor cluster — AQE owns runtime re-planning (partition
coalescing, skew-join splitting, dynamic broadcast), so the static settings
here are deliberately few.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions for the *local* test harness. On a real cluster this is
# a floor only: AQE coalesces small partitions and splits skewed ones at
# runtime, so we set the initial number high there (e.g. 2000+ for 100 TB
# inputs) and let adaptive execution shrink it per-stage.
_LOCAL_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def configure(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply the engine's Spark conf to any builder (local or cluster)."""
    return (
        builder
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, and sort-merge→broadcast demotion. This is the core of
        # the 100 TB posture — plans self-correct from observed stats.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for the few pandas UDFs we do have (email parse,
        # multimodal decode) — batch columnar transfer, not per-row pickling.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: dims (region/nation/customer at small SF) are
        # broadcast; AQE upgrades joins when runtime size < threshold too.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(_LOCAL_SHUFFLE_PARTITIONS))
        # Parquet: keep predicate pushdown + dictionary filtering on
        # (defaults, pinned here because the engine depends on them).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Partition sizing for scans: 128 MiB splits are the right grain for
        # 100 TB of parquet (≈800k tasks at 128 MiB → AQE coalesces).
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # The synthetic events table stores TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read as long nanos, Catalog converts to a
        # micros timestamp (exact integer division — no double round-trip).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )


def get_spark(app_name: str = "hierarchical-graph-db-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Locally: ``local[$SPARK_GRAFT_CPUS]``. On a cluster the same conf applies;
    master comes from spark-submit instead.
    """
    builder = SparkSession.builder.appName(app_name)
    if not os.environ.get("SPARK_MASTER"):  # local test harness
        builder = builder.master(f"local[{_LOCAL_CPUS}]")
        # local[N] runs driver and all N executor threads in ONE JVM whose
        # default heap is spark.driver.memory=1g — fine at the unit-test
        # scale factors, but an sf1 (6M-row lineitem) sweep OOMs it. Size
        # the single JVM like the N executors it stands in for; only
        # honored when this process launches the JVM (first session). On a
        # real cluster the submit config owns memory and this is skipped.
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    return configure(builder).getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
