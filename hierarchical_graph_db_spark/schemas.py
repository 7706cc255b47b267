"""Declared StructType schemas.

The reference stores schemaless BSON (its model layer ``app/common/models.py``
is an empty file); the de-facto email document shape is reconstructed in
SURVEY.md §1.2 from ``app/agents/parsing_agent.py:49-64``. This engine is
schema-on-write: every table has a declared StructType, which is what lets
Parquet column pruning and predicate pushdown work at 100 TB.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Email corpus model (reference parity; SURVEY.md §1.2) -------------------

ATTACHMENT = StructType(
    [
        StructField("filename", StringType()),
        StructField("content_type", StringType()),
        StructField("size", LongType()),
    ]
)

MAILBOX = StructType(
    [
        StructField("user", StringType()),
        StructField("folder", StringType()),
        StructField("filename", StringType()),
    ]
)

ENTITY = StructType(
    [
        StructField("text", StringType()),
        StructField("type", StringType()),
    ]
)

# One row per *unique* email after the dedup merge (reference: the `Emails`
# collection, app/agents/parsing_agent.py:49-64).
EMAIL = StructType(
    [
        StructField("dedupe_key", StringType(), nullable=False),
        StructField("message_id", StringType()),
        StructField("date", TimestampType()),
        StructField("from", StringType()),
        StructField("to", ArrayType(StringType())),
        StructField("cc", ArrayType(StringType())),
        StructField("bcc", ArrayType(StringType())),
        StructField("subject", StringType()),
        StructField("body", StringType()),
        StructField("attachments", ArrayType(ATTACHMENT)),
        StructField("mailboxes", ArrayType(MAILBOX)),
        StructField("headers", MapType(StringType(), StringType())),
        StructField("entities", ArrayType(ENTITY)),
        StructField("thread_id", StringType()),
    ]
)

# Pre-merge parse output: EMAIL minus mailboxes-as-set, plus source location
# and a quarantine column (reference: per-file try/except warn-and-skip,
# ingest_enron.py:205-206 — we keep the row and tag it instead).
PARSED_EMAIL = StructType(
    [
        StructField("dedupe_key", StringType()),
        StructField("message_id", StringType()),
        StructField("date", TimestampType()),
        StructField("from", StringType()),
        StructField("to", ArrayType(StringType())),
        StructField("cc", ArrayType(StringType())),
        StructField("bcc", ArrayType(StringType())),
        StructField("subject", StringType()),
        StructField("body", StringType()),
        StructField("attachments", ArrayType(ATTACHMENT)),
        StructField("headers", MapType(StringType(), StringType())),
        StructField("user", StringType()),
        StructField("folder", StringType()),
        StructField("filename", StringType()),
        StructField("error", StringType()),  # null = clean parse
    ]
)

# Ingestion-job state machine (reference: `jobs` collection, app/main.py:22-28).
JOB = StructType(
    [
        StructField("_id", StringType(), nullable=False),
        StructField("created_at", TimestampType()),
        StructField("status", StringType()),  # QUEUED|PARSING|PARSED|EMPTY
        StructField("source", StringType()),
        StructField("input_dir", StringType()),
        StructField("file_count", LongType()),
    ]
)

# Communication-graph edges (SURVEY.md §2.10 G3 / FIXTURES.md B4).
EDGE = StructType(
    [
        StructField("src", StringType(), nullable=False),
        StructField("dst", StringType(), nullable=False),
        StructField("kind", StringType()),
        StructField("date", TimestampType()),
    ]
)

# --- Multimodal columns (north-star; opaque binary + typed metadata) ---------

MEDIA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("kind", StringType()),  # image|audio|video
        StructField("content", BinaryType()),
        StructField("content_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("source_uri", StringType()),
    ]
)

# --- Driver-provided synthetic tables (FIXTURES.md §A) -----------------------

FIXTURES = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(FIXTURES)
