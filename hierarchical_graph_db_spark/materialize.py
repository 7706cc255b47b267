"""Lineage-cut materialization for iterative algorithms.

Every iterative operator in the engine (PageRank, connected components,
k-means, BPE merge rounds, LR gradient descent, CDC replay, ...) must cut
lineage each round or the logical plan grows exponentially.  Two Spark
mechanisms exist:

- ``DataFrame.localCheckpoint(eager=True)`` — blocks cached on the executors
  that computed them, no filesystem round-trip.  Fast, but **lineage-unsafe
  on a real cluster**: if an executor is lost, the truncated lineage cannot
  recompute its blocks and the job fails.  Correct for ``local[N]`` (one JVM,
  executor loss == driver loss anyway).
- ``DataFrame.checkpoint(eager=True)`` — writes blocks to the checkpoint
  directory (HDFS/S3/NFS on a cluster) so recovery survives executor loss.
  This is the 100 TB posture (SCALING.md §durable-checkpoint).

:func:`materialize` picks per-session: if the ``SparkContext`` has a
checkpoint directory configured (``sc.setCheckpointDir(...)``, or the
``SPARK_GRAFT_CHECKPOINT_DIR`` env var consumed by ``session.get_spark``),
every iterative operator transparently uses the durable path; otherwise the
executor-local fast path.  Call sites chain it as
``df.transform(materialize)`` exactly where ``localCheckpoint`` used to be
called, so the algorithm code stays oblivious to the deployment mode.

Results are bit-identical either way — checkpointing changes *where* the
materialized blocks live, never their content — and
``tests/test_multi_executor.py`` pins that: the iterative family is re-run
under ``local-cluster[2,2,...]`` (two separate executor JVMs) with a durable
checkpoint dir and hashes must equal the ``local[*]`` run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_dir_set(df: DataFrame) -> bool:
    """True if the session's SparkContext has a durable checkpoint dir."""
    return df.sparkSession.sparkContext.getCheckpointDir() is not None


def materialize(df: DataFrame) -> DataFrame:
    """Cut lineage and materialize ``df`` eagerly.

    Durable ``checkpoint()`` when the context has a checkpoint dir (cluster
    posture: survives executor loss), else ``localCheckpoint()`` (local[N]
    fast path).  Use as ``df.transform(materialize)``.
    """
    if checkpoint_dir_set(df):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
