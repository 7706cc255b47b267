"""Entity extraction (reference G1 — declared, never implemented).

The reference planned a spaCy NER agent (``README.md:86``, dep
``requirements.txt:9``) writing ``entities: [{text, type}]`` with an index on
``(entities.text, entities.type)`` (``ingest_enron.py:152``). This engine
ships the *pipeline shape* with a deterministic dictionary/regex scorer —
pure Catalyst expressions, so it is SQL-oracle-checkable and runs JVM-side;
swapping in a model-based extractor is one ``mapInPandas`` stage with the
same output schema (exactly how the multimodal decode stub is structured).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.functions.text import tokens

#: Dictionary gazetteer: surface form → entity type. Frozen — it is part of
#: the operator contract (the SQL oracles embed the same table).
ENTITY_TYPES: dict[str, tuple[str, ...]] = {
    "op": ("scan", "join", "agg", "merge", "sort", "filter", "window"),
    "obj": ("table", "row", "column", "partition", "index", "batch"),
}


def extract_entities(text: Column | str) -> Column:
    """text → ``array<struct<text:string,type:string>>``, sorted by (type,
    text) for deterministic array equality; each distinct surface form
    appears once per type."""
    toks = F.array_distinct(tokens(F.lower(text) if isinstance(text, str)
                                   else F.lower(text)))
    per_type = []
    for etype, words in ENTITY_TYPES.items():
        wordlist = F.array(*[F.lit(w) for w in words])
        hits = F.filter(toks, lambda t: F.array_contains(wordlist, t))
        per_type.append(
            F.transform(
                F.array_sort(hits),
                lambda t: F.struct(t.alias("text"), F.lit(etype).alias("type")),
            )
        )
    out = per_type[0]
    for p in per_type[1:]:
        out = F.concat(out, p)
    return out


def has_entity(entities: Column, text: str, etype: str) -> Column:
    """Q7's index lookup: ``exists(entities, e -> e.text=t AND e.type=ty)``."""
    return F.exists(
        entities,
        lambda e: (e["text"] == F.lit(text)) & (e["type"] == F.lit(etype)),
    )


def with_entities(emails, text_col: str = "body"):
    """Fill the EMAIL schema's ``entities`` placeholder from the body — the
    pipeline stage the reference stubbed at ``parsing_agent.py:62``."""
    return emails.withColumn("entities", extract_entities(F.col(text_col)))
