"""Entity-extraction queries (G1) and the entity-lookup read path (Q7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.functions.ner import (
    ENTITY_TYPES,
    extract_entities,
    has_entity,
)
from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.queries import query

_SQL_TOKS = "list_distinct(string_split_regex(trim(lower(text)), '\\s+'))"


def _sql_hits(etype: str) -> str:
    words = ", ".join(f"'{w}'" for w in ENTITY_TYPES[etype])
    return (f"list_sort(list_filter({_SQL_TOKS}, t -> t IN ({words})))")


@query(
    "ner_entities",
    f"""
    SELECT doc_id,
           -- DuckDB's array_to_string yields NULL for an EMPTY list;
           -- Spark's array_join yields ''. Pin the Spark convention so
           -- zero-entity documents compare equal.
           coalesce(array_to_string(
               list_concat(
                   list_transform({_sql_hits('op')},  t -> t || ':op'),
                   list_transform({_sql_hits('obj')}, t -> t || ':obj')
               ), '|'), '') AS entities_joined,
           CAST(len({_sql_hits('op')}) + len({_sql_hits('obj')}) AS BIGINT)
               AS n_entities
    FROM documents
    """,
)
def ner_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary NER over documents → (text,type) entity structs; joined to
    a delimited string for cross-engine comparison."""
    docs = Catalog(spark, sf_dir).documents
    ents = extract_entities(F.col("text"))
    return docs.select(
        "doc_id",
        F.array_join(
            F.transform(ents, lambda e: F.concat_ws(":", e["text"], e["type"])),
            "|",
        ).alias("entities_joined"),
        F.size(ents).cast("long").alias("n_entities"),
    )


@query(
    "entity_lookup",
    f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs_with_join_op
    FROM documents
    WHERE len(list_filter({_SQL_TOKS}, t -> t = 'join')) > 0
    GROUP BY lang
    """,
)
def entity_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7's (entities.text, entities.type) index lookup as a predicate over
    the extracted entity array, aggregated per language."""
    docs = Catalog(spark, sf_dir).documents
    ents = extract_entities(F.col("text"))
    return (
        docs.where(has_entity(ents, "join", "op"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_with_join_op"))
    )
