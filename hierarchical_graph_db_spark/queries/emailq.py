"""Email-pipeline queries: the reference's parse/dedup/thread surface made
hash-checkable.

The driver owns the fixture tables, so these queries *synthesize* RFC822
messages from ``documents`` deterministically inside Spark, push them through
the real parse UDF (``sources/maildir.py`` — the P1-P9 pipeline), and the
DuckDB oracle reconstructs the expected output directly from ``documents``.
That makes the Python-UDF pipeline itself differential-tested, not just
pytest-tested: header extraction, address normalization, RFC2822 date → UTC,
the Message-ID/content-hash dedupe-key coalesce (including Python's canonical
JSON form), and thread reconstruction over in-reply-to chains.

Synthesis contract (both engines encode it):
* message_id = ``<d{doc_id}@synth>``, omitted when ``doc_id % 7 == 0``
  (exercises the hash-fallback branch of parsing_agent.py:41-47);
* from = ``User{doc_id%50} <USER{doc_id%50}@Example.COM>`` (normalization);
* to = two addresses; date = 2024-03-01 + (doc_id % 1440) minutes, +0000;
* subject = ``doc {doc_id}``; body = the document text (no JSON-escapable
  characters in the corpus — asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.graph import thread_ids
from hierarchical_graph_db_spark.queries import query
from hierarchical_graph_db_spark.sources.maildir import merge_parsed, parse_emails


def _synthetic_raw() -> F.Column:
    did = F.col("doc_id")
    ts = F.expr(
        "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0, doc_id % 1440, 0)"
    )
    msgid_line = F.when(
        did % 7 == 0, F.lit("")
    ).otherwise(F.concat(F.lit("Message-ID: <d"), did, F.lit("@synth>\n")))
    return F.concat(
        msgid_line,
        F.lit("From: User"), did % 50,
        F.lit(" <USER"), did % 50, F.lit("@Example.COM>\n"),
        F.lit("To: a"), (did + 1) % 50, F.lit("@example.com, b"),
        (did + 2) % 50, F.lit("@example.com\n"),
        F.lit("Date: "),
        F.date_format(ts, "EEE, dd MMM yyyy HH:mm:ss +0000"),
        F.lit("\n"),
        F.lit("Subject: doc "), did, F.lit("\n\n"),
        F.col("text"),
    )


def _synthetic_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (content: binary, user, folder, filename) scan-shaped rows."""
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        F.encode(_synthetic_raw(), "UTF-8").alias("content"),
        F.col("source").alias("user"),
        F.col("lang").alias("folder"),
        F.col("doc_id").cast("string").alias("filename"),
    )


# DuckDB twins of the synthesis contract.
_DK_MSGID = "'<d' || doc_id || '@synth>'"
_DK_FROM = "'user' || (doc_id % 50) || '@example.com'"
_DK_TO = ("'a' || ((doc_id + 1) % 50) || '@example.com'"
          ", 'b' || ((doc_id + 2) % 50) || '@example.com'")
_DK_DATE = ("TIMESTAMP '2024-03-01 00:00:00' "
            "+ (doc_id % 1440) * INTERVAL 1 MINUTE")
# Python json.dumps(sort_keys=True, ensure_ascii=False) canonical form of the
# hash payload {from,to,date,subject,body[:2000]} — parsing_agent.py:41-47.
_DK_CANON_JSON = (
    "'{{\"body\": \"' || substr(text, 1, 2000) || '\", "
    "\"date\": \"' || strftime({date}, '%Y-%m-%dT%H:%M:%S') || '+00:00\", "
    "\"from\": \"' || {frm} || '\", "
    "\"subject\": \"doc ' || doc_id || '\", "
    "\"to\": [\"' || {to_a} || '\", \"' || {to_b} || '\"]}}'"
).format(
    date=_DK_DATE,
    frm=_DK_FROM,
    to_a="'a' || ((doc_id + 1) % 50) || '@example.com'",
    to_b="'b' || ((doc_id + 2) % 50) || '@example.com'",
)


@query(
    "email_pipeline_parse",
    f"""
    SELECT CASE WHEN doc_id % 7 <> 0 THEN {_DK_MSGID}
                ELSE 'hash_' || sha256({_DK_CANON_JSON}) END AS dedupe_key,
           CASE WHEN doc_id % 7 <> 0 THEN {_DK_MSGID} END    AS message_id,
           {_DK_FROM}                                        AS from_addr,
           {_DK_TO.split(',')[0].strip()} || ',' ||
           {_DK_TO.split(',', 1)[1].strip()}                 AS to_joined,
           {_DK_DATE}                                        AS date,
           'doc ' || doc_id                                  AS subject,
           sha256(text)                                      AS body_sha
    FROM documents
    """,
)
def email_pipeline_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P9 end-to-end through the real mapInPandas parse UDF; the oracle
    reconstructs every field — including Python's canonical-JSON content
    hash — straight from ``documents``."""
    parsed = parse_emails(_synthetic_emails(spark, sf_dir))
    return parsed.select(
        "dedupe_key",
        "message_id",
        F.col("from").alias("from_addr"),
        F.array_join("to", ",").alias("to_joined"),
        "date",
        "subject",
        F.sha2(F.encode("body", "UTF-8"), 256).alias("body_sha"),
    )


@query(
    "email_ingest_dedup",
    f"""
    WITH boxes AS (
        SELECT doc_id, source || '/' || lang || '/' || doc_id AS box
        FROM documents
        UNION ALL
        SELECT doc_id, 'zz_dup/copy/' || doc_id AS box
        FROM documents WHERE doc_id % 3 = 0
    )
    SELECT CASE WHEN d.doc_id % 7 <> 0 THEN '<d' || d.doc_id || '@synth>'
                ELSE 'hash_' || sha256({_DK_CANON_JSON.replace('doc_id', 'd.doc_id').replace('(text', '(d.text').replace('substr(text', 'substr(d.text')}) END AS dedupe_key,
           'doc ' || d.doc_id                        AS subject,
           CAST(count(*) AS BIGINT)                  AS n_mailboxes,
           string_agg(b.box, '|' ORDER BY b.box)     AS mailboxes_joined
    FROM documents d JOIN boxes b ON d.doc_id = b.doc_id
    GROUP BY d.doc_id, d.text
    """,
)
def email_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3 through the full pipeline: every doc lands in its maildir
    location, docs with ``doc_id % 3 == 0`` land in a second mailbox too;
    the merge collapses to one row per dedupe_key with the mailbox set."""
    emails = _synthetic_emails(spark, sf_dir)
    dup = emails.where(F.col("filename").cast("long") % 3 == 0).select(
        "content", F.lit("zz_dup").alias("user"), F.lit("copy").alias("folder"),
        "filename",
    )
    merged = merge_parsed(parse_emails(emails.unionByName(dup)))
    box = F.transform(
        "mailboxes",
        lambda m: F.concat_ws("/", m["user"], m["folder"], m["filename"]),
    )
    return merged.select(
        "dedupe_key",
        "subject",
        F.size("mailboxes").cast("long").alias("n_mailboxes"),
        F.array_join(F.array_sort(box), "|").alias("mailboxes_joined"),
    )


@query(
    "email_threads",
    """
    SELECT '<d' || doc_id || '>'                  AS message_id,
           '<d' || (doc_id - doc_id % 5) || '>'   AS thread_id
    FROM documents
    """,
)
def email_threads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 thread reconstruction: reply chains of 5 (doc i replies to i-1
    unless i % 5 == 0) → connected components → thread id = chain-head
    message id. Chains never straddle a digit-count boundary (they start at
    multiples of 5), so lexicographic min == numeric min."""
    docs = Catalog(spark, sf_dir).documents
    emails = docs.select(
        F.concat(F.lit("<d"), "doc_id", F.lit(">")).alias("message_id"),
        F.when(
            F.col("doc_id") % 5 != 0,
            F.map_from_arrays(
                F.array(F.lit("in-reply-to")),
                F.array(F.concat(F.lit("<d"), F.col("doc_id") - 1, F.lit(">"))),
            ),
        ).otherwise(
            F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            )
        ).alias("headers"),
    )
    return thread_ids(emails)


@query(
    "email_header_map_stats",
    """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
    SELECT 'date' AS header_key, (SELECT total FROM n) AS n_messages,
           (SELECT CAST(count(DISTINCT doc_id % 1440) AS BIGINT)
            FROM documents) AS n_distinct_values
    UNION ALL
    SELECT 'from', (SELECT total FROM n),
           (SELECT CAST(count(DISTINCT doc_id % 50) AS BIGINT)
            FROM documents)
    UNION ALL
    SELECT 'message-id',
           (SELECT CAST(count(*) AS BIGINT) FROM documents
            WHERE doc_id % 7 <> 0),
           (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM documents
            WHERE doc_id % 7 <> 0)
    UNION ALL
    SELECT 'subject', (SELECT total FROM n),
           (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM documents)
    UNION ALL
    SELECT 'to', (SELECT total FROM n),
           (SELECT CAST(count(DISTINCT doc_id % 50) AS BIGINT)
            FROM documents)
    """,
)
def email_header_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parsed ``headers`` map<string,string> column (SURVEY §1.2 —
    lowercased keys, duplicate headers newline-joined), aggregated per
    header key: message count and distinct raw values. Exercises the
    MapType surface end-to-end (map build in the parse kernel →
    explode(map) → keyed aggregate); the oracle derives each key's
    expected counts from the synthesis contract independently (message-id
    present iff doc_id % 7 ≠ 0; from/to determined mod 50; date mod 1440
    minutes), so a dropped header, a case-normalization bug, or a
    value-mangling regression all mismatch."""
    parsed = parse_emails(_synthetic_emails(spark, sf_dir))
    return (
        parsed.select(F.explode("headers").alias("header_key", "value"))
        .groupBy("header_key")
        .agg(F.count(F.lit(1)).alias("n_messages"),
             F.countDistinct("value").alias("n_distinct_values"))
    )


def _synthetic_mime_raw() -> F.Column:
    """Multipart MIME synthesis — the attachment-bearing variant of
    :func:`_synthetic_raw`: ``doc_id % 3`` base64 attachments of
    deterministic sizes 10 + ((doc_id + i) % 7) bytes, so the oracle can
    derive every attachment count and byte total arithmetically."""
    did = F.col("doc_id")
    bnd = F.concat(F.lit("B"), did)

    def att(i: int) -> F.Column:
        size = F.lit(10) + (did + i) % 7
        payload = F.base64(F.encode(F.repeat(F.lit("x"), size), "UTF-8"))
        return F.when(did % 3 > i, F.concat(
            F.lit("--"), bnd, F.lit("\n"),
            F.lit("Content-Type: application/octet-stream\n"),
            F.lit('Content-Disposition: attachment; filename="f'), did,
            F.lit(f"_{i}.bin\"\n"),
            F.lit("Content-Transfer-Encoding: base64\n\n"),
            payload, F.lit("\n"),
        )).otherwise(F.lit(""))

    return F.concat(
        F.lit("Message-ID: <m"), did, F.lit("@synth>\n"),
        F.lit("From: user"), did % 50, F.lit("@example.com\n"),
        F.lit("To: a"), (did + 1) % 50, F.lit("@example.com\n"),
        F.lit("Subject: mime doc "), did, F.lit("\n"),
        F.lit("MIME-Version: 1.0\n"),
        F.lit('Content-Type: multipart/mixed; boundary="'), bnd,
        F.lit('"\n\n'),
        F.lit("--"), bnd, F.lit("\n"),
        F.lit("Content-Type: text/plain\n\n"),
        F.col("text"), F.lit("\n"),
        att(0), att(1),
        F.lit("--"), bnd, F.lit("--\n"),
    )


@query(
    "email_attachment_stats",
    """
    SELECT source AS user,
           CAST(count(*) AS BIGINT) AS n_msgs,
           CAST(sum(CASE WHEN doc_id % 3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_attachments,
           CAST(sum(doc_id % 3) AS BIGINT) AS n_attachments,
           CAST(sum(CASE doc_id % 3
                    WHEN 0 THEN 0
                    WHEN 1 THEN 10 + (doc_id % 7)
                    ELSE 20 + (doc_id % 7) + ((doc_id + 1) % 7)
                    END) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY source
    """,
)
def email_attachment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parser's MULTIPART branch exercised end-to-end: synthesized
    multipart/mixed messages carry doc_id % 3 base64 attachments of
    arithmetic sizes; the full RFC822 kernel walks the parts, decodes the
    base64 payloads, and records (filename, content_type, size) structs
    (SURVEY §1.4 #4 — attachments scanned only when multipart); the query
    aggregates attachment counts and DECODED byte totals per user. The
    oracle derives every number from the synthesis arithmetic alone — a
    wrong walk, a missed decode, or a text-part miscount all
    hash-mismatch."""
    docs = Catalog(spark, sf_dir).documents
    emails = docs.select(
        F.encode(_synthetic_mime_raw(), "UTF-8").alias("content"),
        F.col("source").alias("user"),
        F.col("lang").alias("folder"),
        F.col("doc_id").cast("string").alias("filename"),
    )
    parsed = parse_emails(emails)
    return (
        parsed.where(F.col("error").isNull())
        .groupBy("user")
        .agg(F.count(F.lit(1)).alias("n_msgs"),
             F.sum(F.when(F.size("attachments") > 0, 1).otherwise(0))
             .cast("bigint").alias("n_with_attachments"),
             F.sum(F.size("attachments")).cast("bigint")
             .alias("n_attachments"),
             F.sum(F.aggregate(F.col("attachments"),
                               F.lit(0).cast("bigint"),
                               lambda acc, a: acc + a["size"]))
             .cast("bigint").alias("total_bytes"))
    )
