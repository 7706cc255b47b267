"""Transactional bucket-partitioned parquet store for ``foreachBatch`` sinks.

The reference keeps its merged corpus in Mongo behind a unique index
(``app/agents/parsing_agent.py:70-83``); redelivered jobs reconverge because
the upsert is idempotent. The Spark twin below gives the same effects
contract on plain parquet, *without ever pulling store state through the
driver* and *without rewriting untouched data*:

* The store is hash/time bucketed: ``data/<bucket_col>=<v>/part-*.parquet``.
  A micro-batch only ever touches the buckets its keys hash into, so the
  read side prunes to touched partitions and the write side replaces only
  those directories (dynamic partition overwrite). Per-batch cost is
  O(|batch| + |touched buckets|), not O(|store|) — the property that keeps
  this alive at 100 TB where a full-store rewrite (or a driver
  ``collect()``) would not be.

* Writes follow a write-ahead protocol so a crash at any point replays to
  the same state (exactly-once effects):

  1. replay guard — ``batch_id <= committed`` is a no-op; a surviving
     ``pending`` marker + complete scratch means "redo only the copy";
  2. the merged replacement rows for the touched buckets are written to a
     scratch directory (the store is a read-only *input* of that plan, so
     there is no read-then-overwrite conflict and no driver materialize);
  3. ``pending`` marker records the batch;
  4. scratch is copied into ``data/`` with dynamic partition overwrite —
     idempotent, because scratch already holds the post-merge rows;
  5. ``committed`` marker advances, pending + scratch are removed.

Driver memory is O(#touched bucket ids) — the key list — never store rows.

Markers are single JSON files swapped in with ``os.replace`` (atomic on
POSIX). On an object store the same protocol holds with a conditional-put
manifest; the local filesystem form is what the fixture harness exercises.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BucketedParquetStore:
    """A parquet store partitioned on one bucket column, with write-ahead
    batch commits. The bucket column must be a pure function of the store
    key so each key lives in exactly one partition directory."""

    def __init__(self, spark: SparkSession, path: str, bucket_col: str = "bucket_id"):
        self.spark = spark
        self.path = path.rstrip("/")
        self.bucket_col = bucket_col

    # -- layout ------------------------------------------------------------
    @property
    def data_dir(self) -> str:
        return os.path.join(self.path, "data")

    def _meta(self, name: str) -> str:
        return os.path.join(self.path, "_meta", name)

    def _scratch(self, batch_id: int) -> str:
        return os.path.join(self.path, "_scratch", f"b{batch_id}")

    # -- markers -----------------------------------------------------------
    def _read_marker(self, name: str) -> int:
        try:
            with open(self._meta(name), encoding="utf-8") as f:
                return int(json.load(f)["batch_id"])
        except (OSError, ValueError, KeyError):
            return -1

    def _write_marker(self, name: str, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._meta(name)), exist_ok=True)
        tmp = self._meta(name) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, self._meta(name))

    def committed_batch_id(self) -> int:
        return self._read_marker("committed.json")

    # -- read side ----------------------------------------------------------
    def exists(self) -> bool:
        return os.path.isdir(self.data_dir)

    def read(self, buckets: list | None = None) -> DataFrame:
        """Current store contents (including the bucket column). With
        ``buckets``, partition pruning keeps the scan to touched dirs."""
        df = self.spark.read.parquet(self.data_dir)
        if buckets is not None:
            df = df.where(F.col(self.bucket_col).isin(list(buckets)))
        return df

    # -- write-ahead commit --------------------------------------------------
    def already_done(self, batch_id: int) -> bool:
        """Replay guard. True → the caller must skip this batch entirely.
        A pending batch with surviving scratch is finished here (copy step
        only — the merge result was durable before the crash)."""
        if batch_id <= self.committed_batch_id():
            return True
        if (self._read_marker("pending.json") == batch_id
                and os.path.exists(os.path.join(self._scratch(batch_id), "_SUCCESS"))):
            self._copy_scratch(batch_id)
            return True
        return False

    def commit(self, batch_id: int, merged_touched: DataFrame) -> None:
        """Durably replace the touched buckets with ``merged_touched``
        (which must contain ``bucket_col`` and the full post-merge contents
        of every bucket it mentions)."""
        scratch = self._scratch(batch_id)
        # Scratch is written ALREADY partitioned by bucket: the publish step
        # is then a per-bucket directory swap (metadata-only), not a second
        # Spark write of the same data. Clustering on the bucket column
        # first means one file per bucket instead of one per (task, bucket)
        # — without it a 32-task batch over 64 buckets sprays ~2k tiny files.
        (
            merged_touched.repartition(F.col(self.bucket_col))
            .write.mode("overwrite")
            .partitionBy(self.bucket_col)
            .parquet(scratch)
        )
        self._write_marker("pending.json", batch_id)
        self._copy_scratch(batch_id)

    def mark_committed(self, batch_id: int) -> None:
        """Advance the marker for a batch that needed no data change."""
        self._write_marker("committed.json", batch_id)

    def _copy_scratch(self, batch_id: int) -> None:
        """Publish scratch → data as per-bucket directory replacements.

        One rename per touched bucket (object-store equivalent: server-side
        copy + delete under the manifest) — no data re-read, no second write,
        nothing through the driver but directory names. Idempotent under
        replay: a partially-published scratch simply has fewer dirs left to
        move, and every already-moved dir holds the same post-merge rows.
        """
        scratch = self._scratch(batch_id)
        os.makedirs(self.data_dir, exist_ok=True)
        prefix = f"{self.bucket_col}="
        for entry in sorted(os.listdir(scratch)):
            if not entry.startswith(prefix):
                continue
            src = os.path.join(scratch, entry)
            dst = os.path.join(self.data_dir, entry)
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(src, dst)
        self._write_marker("committed.json", batch_id)
        try:
            os.remove(self._meta("pending.json"))
        except OSError:
            pass
        shutil.rmtree(self._scratch(batch_id), ignore_errors=True)
