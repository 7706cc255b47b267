"""JSONL interchange (sources/interchange.py): sharded export round-trips,
shard assignment is key-deterministic, and malformed lines quarantine as
rows instead of failing tasks."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from hierarchical_graph_db_spark.sources.interchange import (
    export_jsonl,
    read_jsonl,
)

_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def test_export_roundtrip_and_shard_count(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 else "de") for i in range(100)],
        _SCHEMA)
    out = str(tmp_path / "shards")
    export_jsonl(df, out, shards=4, shard_key="doc_id")
    parts = [p for p in glob.glob(f"{out}/part-*") if not p.endswith(".crc")]
    assert len(parts) == 4
    good, quar = read_jsonl(spark, out, _SCHEMA)
    assert quar.count() == 0
    back = {(r["doc_id"], r["text"], r["lang"]) for r in good.collect()}
    assert back == {(i, f"text {i}", "en" if i % 2 else "de")
                    for i in range(100)}


def test_shard_assignment_is_key_deterministic(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"t{i}", "en") for i in range(50)], _SCHEMA)
    paths = []
    for run in ("a", "b"):
        out = str(tmp_path / run)
        export_jsonl(df, out, shards=3, shard_key="doc_id")
        shard_of = {}
        for p in sorted(glob.glob(f"{out}/part-*")):
            if p.endswith(".crc"):
                continue
            idx = os.path.basename(p).split("-")[1]
            with open(p) as fh:
                for line in fh:
                    shard_of[json.loads(line)["doc_id"]] = idx
        paths.append(shard_of)
    assert paths[0] == paths[1]


def test_malformed_lines_quarantine_not_fail(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        "{not json at all",
        json.dumps({"doc_id": "NaN?", "text": "bad type", "lang": "en"}),
        json.dumps({"doc_id": 2, "text": "missing lang"}),  # null-fills
    ]
    (d / "f.jsonl").write_text("\n".join(lines))
    good, quar = read_jsonl(spark, str(d), _SCHEMA)
    g = {r["doc_id"]: (r["text"], r["lang"]) for r in good.collect()}
    assert g[1] == ("ok", "en")
    assert g[2] == ("missing lang", None)
    raws = [r["raw_line"] for r in quar.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)


def test_export_compression_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", "en")], _SCHEMA)
    out = str(tmp_path / "gz")
    export_jsonl(df, out, shards=1, compression="gzip")
    assert glob.glob(f"{out}/part-*.gz")
    good, _ = read_jsonl(spark, out, _SCHEMA)
    assert good.count() == 1
