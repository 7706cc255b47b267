"""JSONL interchange: sharded export sink + quarantined reader.

Training-data pipelines deliver and accept corpora as JSON-Lines shards
(the de-facto interchange format of every public data-curation stack), so
the engine needs both directions as first-class, scale-shaped operations:

* **export** — `df.write.json` with an explicit shard count and
  hash-clustered rows: `repartition(n, key)` makes shard membership a pure
  function of the key (re-runs produce the same shard assignment — the
  reproducibility contract the sampling/dedup operators already follow),
  and one output task per shard avoids the small-file swarm;
* **read** — schema-pinned `spark.read.json` in PERMISSIVE mode with a
  corrupt-record column: a malformed line becomes a quarantine ROW (raw
  line preserved for replay), never a task failure — the same
  bad-input contract as the maildir parser (`sources/maildir.py`), applied
  to the text-file boundary. Schema is declared, not inferred: inference
  costs an extra full pass at 100 TB and silently widens types on dirty
  data.

Both directions are pytest-covered round-trip + quarantine
(`tests/test_interchange.py`); there is no oracle query because sinks and
sources are effects, not DataFrame transforms — the same treatment as the
store and staging S-items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: Column that receives the raw text of unparseable lines (PERMISSIVE mode).
CORRUPT_COL = "_corrupt_record"


def export_jsonl(df: DataFrame, path: str, shards: int,
                 shard_key: str | None = None,
                 compression: str | None = None) -> None:
    """Write ``df`` as ``shards`` JSONL part-files under ``path``.

    With ``shard_key`` the assignment is hash-of-key — deterministic across
    re-runs and co-locating rows of one key in one shard (downstream
    consumers that read a shard get complete key groups); without it Spark
    round-robins for pure size balance. One writer task per shard: at 100 TB
    pick ``shards`` so each lands near the blob-store sweet spot
    (~256 MiB-1 GiB), not thousands of small files.
    """
    out = (df.repartition(shards, F.col(shard_key)) if shard_key
           else df.repartition(shards))
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType) -> tuple[DataFrame, DataFrame]:
    """Read JSONL under a declared schema → (good, quarantine).

    PERMISSIVE mode with a corrupt-record column: a malformed line (or one
    whose values cannot cast to the declared types) yields a row whose data
    columns are null and whose ``_corrupt_record`` holds the raw line.
    ``good`` strips the marker column; ``quarantine`` keeps (raw_line) for
    replay/inspection. Missing fields on well-formed lines null-fill (the
    wide-schema read), extra fields are ignored — schema evolution without
    a second pass.
    """
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark disallows filtering on ONLY the corrupt-record column of a raw
    # JSON scan (it would force a per-query re-parse); the documented
    # contract is to materialize first. Cache scope is the caller's
    # session; both returned frames share the one parsed pass.
    raw = raw.cache()
    good = raw.where(F.col(CORRUPT_COL).isNull()) \
        .select(*[f.name for f in schema.fields])
    quarantine = raw.where(F.col(CORRUPT_COL).isNotNull()) \
        .select(F.col(CORRUPT_COL).alias("raw_line"))
    return good, quarantine
