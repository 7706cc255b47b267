"""Parquet catalog: scan/sink layer.

Reference analogs: the maildir tree scan + MongoDB sink (SURVEY.md §2.1 S1/S5).
Here the canonical storage is columnar Parquet with declared schemas; reads go
through :class:`Catalog` so every query gets column pruning and predicate
pushdown at the scan (verify with ``.explain`` → ``ReadSchema``/``PushedFilters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Resolves table names to DataFrames for one scale-factor directory.

    ``register_views=True`` additionally exposes each table as a temp view so
    operators can be written in SQL. At 100 TB these would be external-catalog
    tables partitioned on their natural keys (orders by o_orderdate month,
    events by ts day); the synthetic fixtures are single files, so partition
    pruning is exercised in tests rather than here.

    **Session-wide side effect (deliberate, first ``events`` read only):**
    reading ``events`` pins ``spark.sql.session.timeZone=UTC`` and
    ``spark.sql.legacy.parquet.nanosAsLong=true`` on the caller's session for
    the rest of its lifetime. The tz pin is load-bearing for cross-engine
    parity: every downstream wall-clock operation (``date_trunc``, window
    boundaries, the driver's collect-and-render) must agree with the DuckDB
    oracle's UTC rendering, and those run lazily — a save/restore scope
    cannot cover execution time. Callers that need a different session tz
    should use a separate SparkSession for non-engine work. (The *parse* of
    the MICROS-vintage ntz column itself is tz-independent via
    ``to_utc_timestamp``.)
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                 register_views: bool = False):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}
        if register_views:
            self.register_all_views()

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in TABLE_NAMES:
                raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
            # Schema from the parquet footer (self-describing); declared
            # schemas in schemas.FIXTURES are asserted in tests instead of
            # forced here, so footer/declared drift fails loudly not silently.
            if name == "events":
                # Fixture generations have stored ts as TIMESTAMP(NANOS)
                # (read as long nanos under nanosAsLong) or TIMESTAMP(MICROS)
                # (read as timestamp_ntz). Sniff the footer type and normalize
                # both to a session-tz (UTC) timestamp so every downstream
                # query sees one ts type regardless of fixture vintage. Conf
                # set here (not only in session.py) so the queries also work
                # under a caller-provided SparkSession (the driver's).
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                # Downstream wall-clock ops (date_trunc, windows, the
                # driver's render) must agree with the oracle's UTC — pin
                # the session tz (documented session-wide side effect, see
                # class docstring).
                self.spark.conf.set("spark.sql.session.timeZone", "UTC")
                df = self.spark.read.parquet(self.path(name))
                if df.schema["ts"].dataType.simpleString() == "bigint":
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
                else:
                    # ntz wall time read AS UTC — tz-independent (unlike a
                    # bare cast, which reinterprets in the session tz).
                    df = df.withColumn(
                        "ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
            else:
                df = self.spark.read.parquet(self.path(name))
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def register_all_views(self) -> None:
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Parquet sink (reference S5's durable-store analog).

    ``partition_by`` is the 100 TB lever: date-partitioned email/event tables
    give partition pruning on the reference's date-range query surface
    (SURVEY.md §2.3 Q5).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(df: DataFrame, table: str, path: str,
                   key: str | list[str],
                   n_buckets: int = 64,
                   sort_by: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed+sorted table layout — the co-located-join lever at 100 TB.

    Writes ``df`` hash-bucketed (and per-file sorted) on ``key`` as catalog
    table ``table`` backed by ``path``. Two tables bucketed on the same key
    with the same bucket count join WITHOUT an Exchange on either side
    (pinned in ``tests/test_storage_layout.py::
    test_bucketed_join_needs_no_shuffle``) — the layout for the dedupe-key
    merge, the CDC anti-join base, and the incremental-view state tables.

    The frame is repartitioned on the key into ``n_buckets`` partitions
    first: Spark's writer otherwise emits one file per (task, bucket) —
    a 1000-task batch over 64 buckets sprays 64k small files; repartition
    uses the SAME murmur3 hash as ``bucketBy``, so each task then holds
    exactly one bucket and writes one file. Readers use
    ``spark.table(table)``; the session catalog carries the bucket spec
    (at 100 TB: an external metastore).

    ``key`` may be a list for composite bucket keys (e.g. the LSH signature
    index bucketed on (band, band_key)); an exchange-free join then requires
    the join keys to equal the bucket columns exactly."""
    keys = [key] if isinstance(key, str) else list(key)
    (df.repartition(n_buckets, *[F.col(k) for k in keys])
       .write.mode(mode)
       .option("path", path)
       .bucketBy(n_buckets, keys[0], *keys[1:])
       .sortBy(*(sort_by or keys))
       .saveAsTable(table))


LSH_MANIFEST_NAME = "_lsh_manifest.json"


def write_lsh_index(df: DataFrame, table: str, path: str,
                    n: int = 3, n_hashes: int = 16, bands: int = 4,
                    n_buckets: int = 64, mode: str = "overwrite") -> dict:
    """Persist a MinHash-LSH signature index (the ``lsh_band_table`` rows)
    bucketed on (band, band_key) PLUS its parameter manifest sidecar
    (VERDICT r10 next-round #2): ``_lsh_manifest.json`` inside the table
    directory records {schema_version, n, n_hashes, bands, normalization}
    at build time, so every later probe batch validates compatibility by
    an O(1) dict comparison instead of re-scanning the corpus-sized
    band_key column (``incremental_minhash_dedup(index_manifest=...)``).
    Spark data readers ignore underscore-prefixed files, so the sidecar
    rides in the same directory as the buckets. Returns the manifest dict
    (also readable later via :func:`read_lsh_manifest`)."""
    import json

    from hierarchical_graph_db_spark.operators.dedup_fuzzy import (
        lsh_index_manifest,
    )

    write_bucketed(df, table, path, key=["band", "band_key"],
                   n_buckets=n_buckets, mode=mode)
    manifest = lsh_index_manifest(n=n, n_hashes=n_hashes, bands=bands)
    with open(os.path.join(path, LSH_MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def read_lsh_manifest(path: str) -> dict | None:
    """Read a persisted LSH index's parameter manifest; ``None`` when the
    index predates manifests (callers then fall back to the deep content
    check with a warning — see ``incremental_minhash_dedup``)."""
    import json

    mf = os.path.join(path, LSH_MANIFEST_NAME)
    if not os.path.exists(mf):
        return None
    with open(mf) as fh:
        return json.load(fh)
