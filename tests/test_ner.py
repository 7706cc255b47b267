"""Entity-extraction (G1) and entity-lookup (Q7) unit tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.functions.ner import (
    extract_entities,
    has_entity,
    with_entities,
)


def test_extract_entities_dictionary(spark):
    df = spark.createDataFrame([
        Row(text="Scan the TABLE then join join the row"),
        Row(text="nothing relevant here"),
    ])
    out = [r[0] for r in df.select(extract_entities("text")).collect()]
    e0 = {(e["text"], e["type"]) for e in out[0]}
    assert e0 == {("scan", "op"), ("join", "op"), ("table", "obj"), ("row", "obj")}
    # dedup: 'join' twice in text → once in entities
    assert len(out[0]) == 4
    assert out[1] == []


def test_has_entity_lookup(spark):
    df = spark.createDataFrame([Row(text="merge the partition")])
    ents = extract_entities("text")
    row = df.select(
        has_entity(ents, "merge", "op").alias("a"),
        has_entity(ents, "merge", "obj").alias("b"),
        has_entity(ents, "xyz", "op").alias("c"),
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (True, False, False)


def test_with_entities_fills_email_placeholder(spark):
    emails = spark.createDataFrame([Row(message_id="<m>", body="sort the index")])
    out = with_entities(emails).collect()[0]
    assert {(e["text"], e["type"]) for e in out["entities"]} == \
        {("sort", "op"), ("index", "obj")}
