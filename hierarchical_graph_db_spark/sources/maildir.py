"""Maildir-tree email ingestion — the reference's entire reason for existing.

Reference pipeline (SURVEY.md §2.1-2.4, §3.3): walk ``base/<user>/<folder>/
<file>`` (``ingest_enron.py:164-178``), read bytes (``ingest_enron.py:16-18``),
parse RFC822 (``app/agents/parsing_agent.py:8-64``), dedup-upsert into the
store keyed on ``dedupe_key`` (``parsing_agent.py:67-86``).

Spark-first shape:

* **scan** — ``binaryFile`` source with ``recursiveFileLookup``; the 3-level
  hierarchy comes back as path components via ``regexp_extract`` on
  ``input_file_name()`` (no driver-side os.walk — the listing itself is
  distributed at scale).
* **parse** — ONE ``mapInPandas`` UDF covering P1-P7 (RFC822 parse, charset
  fallback decode, address normalization, RFC2822 date → UTC, multipart body
  concat, attachment metadata, lowercased header map). RFC822 has no Catalyst
  builtin; everything *after* this UDF is relational so Catalyst optimizes the
  rest. Arrow-batched — the Python boundary is crossed once per batch, not
  per row.
* **quarantine** — a bad file yields a row with ``error`` set, never a task
  failure (reference: warn-and-skip, ``ingest_enron.py:205-206``).
* **merge** — ``operators.dedup_merge`` collapses duplicates with
  first-writer-wins over the (user, folder, filename) walk order and
  set-merged ``mailboxes`` (§1.4.1).

100 TB posture: the parse is embarrassingly parallel (no shuffle); the merge
is one hash-aggregate shuffle on the high-cardinality ``dedupe_key``. Output
is date-partitioned parquet (Q5's date-range scans prune partitions).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
from collections.abc import Iterator
from email import message_from_bytes
from email.utils import getaddresses, parsedate_to_datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.operators.dedup_merge import dedup_merge
from hierarchical_graph_db_spark.schemas import PARSED_EMAIL
from hierarchical_graph_db_spark.sources.charset import detect as charset_detect

try:  # optional, matches reference's chardet use (app/common/utils.py:6-14)
    import chardet  # type: ignore
except ImportError:  # pragma: no cover - container has no chardet
    chardet = None


def scan_maildir(spark: SparkSession, base: str) -> DataFrame:
    """S1+S2: distributed scan of ``base/<user>/<folder>/<file>`` → rows of
    (path, user, folder, filename, content: binary).

    Reference walks with ``sorted(os.listdir)`` at 3 levels purely to make
    "first writer" deterministic; here order-independence comes from
    ``min_by`` over the same key in the merge, so listing order is free to be
    parallel.
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(base)
    )
    # path is a URI (file:/... or hdfs://...); the last three components are
    # always <user>/<folder>/<file> for a maildir tree, so negative indexing
    # sidesteps scheme/prefix differences.
    parts = F.split(F.col("path"), "/")
    return df.select(
        F.col("path"),
        F.element_at(parts, -3).alias("user"),
        F.element_at(parts, -2).alias("folder"),
        F.element_at(parts, -1).alias("filename"),
        F.col("content"),
    )


# ---------------------------------------------------------------------------
# P1-P7: the single Python UDF of the engine (SURVEY.md §2.9)
# ---------------------------------------------------------------------------


def _smart_decode(data: bytes) -> str:
    """Charset fallback chain (reference ``app/common/utils.py:6-14``:
    chardet guess → utf-8 → latin-1, errors='ignore').

    Without chardet (this container), the guess stage runs the vendored
    byte-distribution detector (``sources/charset.py``): strict utf-8 probe,
    Cyrillic frequency scoring (koi8-r / windows-1251), structural
    Shift-JIS scan — the charsets where the old latin-1-only fallback
    visibly diverged from chardet on real mail (round-2 verdict item 5).
    Undetected 8-bit data still lands on latin-1, which never fails and
    preserves every byte — chardet's own terminal fallback. Parity corpus
    pinned in tests/test_maildir_ingest.py.
    """
    if not data:
        return ""
    if chardet is not None:
        guess = chardet.detect(data).get("encoding")
    else:
        guess = charset_detect(data)
    if guess:
        try:
            return data.decode(guess, errors="ignore")
        except (LookupError, UnicodeDecodeError):
            pass
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data.decode("latin-1", errors="ignore")


def _parse_addresses(value) -> list[str]:
    """Lowercased, trimmed, empties dropped (``utils.py:16-23``)."""
    if not value:
        return []
    if isinstance(value, str):
        value = [value]
    out = []
    for _, addr in getaddresses(value):
        a = addr.strip().lower()
        if a:
            out.append(a)
    return out


def _to_utc(value: str | None) -> _dt.datetime | None:
    """RFC2822 date → tz-aware UTC; naive → assume UTC; bad → None
    (``utils.py:25-33``)."""
    if not value:
        return None
    try:
        d = parsedate_to_datetime(value)
    except (TypeError, ValueError):
        return None
    if d is None:
        return None
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return d.astimezone(_dt.timezone.utc)


def _content_hash(payload: dict) -> str:
    """``'hash_' + sha256(canonical-JSON)`` (``utils.py:35-37``); the
    canonical form is ``json.dumps(sort_keys=True, ensure_ascii=False)``."""
    blob = json.dumps(payload, sort_keys=True, ensure_ascii=False)
    return "hash_" + hashlib.sha256(blob.encode("utf-8")).hexdigest()


def _parse_one(raw: bytes) -> dict:
    """P1-P9 for one message; mirrors ``parsing_agent.py:8-64`` branch by
    branch (see §1.4 correctness traps)."""
    msg = message_from_bytes(raw)

    message_id = (msg.get("Message-ID") or "").strip() or None
    subject = (msg.get("Subject") or "").strip()
    from_list = _parse_addresses(msg.get("From"))
    from_addr = from_list[0] if from_list else ""
    to = _parse_addresses(msg.get_all("To"))
    cc = _parse_addresses(msg.get_all("Cc"))
    bcc = _parse_addresses(msg.get_all("Bcc"))
    date = _to_utc(msg.get("Date"))

    body_parts: list[str] = []
    attachments: list[dict] = []
    if msg.is_multipart():
        for part in msg.walk():
            if part.get_content_type() == "text/plain":
                payload = part.get_payload(decode=True)
                if payload is not None:
                    body_parts.append(_smart_decode(payload))
            fn = part.get_filename()
            if fn:
                payload = part.get_payload(decode=True) or b""
                attachments.append(
                    {
                        "filename": fn,
                        "content_type": part.get_content_type(),
                        "size": len(payload),
                    }
                )
    else:
        payload = msg.get_payload(decode=True)
        if payload is not None:
            body_parts.append(_smart_decode(payload))
    body = "".join(body_parts)

    headers: dict[str, str] = {}
    for k, v in msg.items():
        lk = k.lower()
        headers[lk] = headers[lk] + "\n" + str(v) if lk in headers else str(v)

    dedupe_key = message_id or _content_hash(
        {
            "from": from_addr,
            "to": to,
            "date": date.isoformat() if date else None,
            "subject": subject,
            "body": body[:2000],  # load-bearing cap (ingest_enron.py:119)
        }
    )
    return {
        "dedupe_key": dedupe_key,
        "message_id": message_id,
        "date": date,
        "from": from_addr,
        "to": to,
        "cc": cc,
        "bcc": bcc,
        "subject": subject,
        "body": body,
        "attachments": attachments,
        "headers": headers,
    }


_ERROR_ROW = {f.name: None for f in PARSED_EMAIL if f.name
              not in ("user", "folder", "filename", "error")}


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for raw, user, folder, filename in zip(
            pdf["content"], pdf["user"], pdf["folder"], pdf["filename"]
        ):
            loc = {"user": user, "folder": folder, "filename": filename}
            try:
                rows.append({**_parse_one(bytes(raw)), **loc, "error": None})
            except Exception as exc:  # quarantine, never task failure
                rows.append({**_ERROR_ROW, **loc, "error": repr(exc)})
        yield pd.DataFrame(rows, columns=[f.name for f in PARSED_EMAIL])


def parse_emails(scanned: DataFrame) -> DataFrame:
    """P1-P7 as one Arrow-batched ``mapInPandas``; output PARSED_EMAIL rows
    with a quarantine ``error`` column.

    Input-skew guard (guide §2.5): a whole-corpus scan that resolves to one
    split (the single-file fixture shape) would put EVERY message through
    one Python worker; round-robin to core-count partitions first — a no-op
    at real maildir scale where the scan has many splits. Results are
    partition-independent (per-row parse; the downstream merge is FWW by
    explicit order columns)."""
    from hierarchical_graph_db_spark.operators.skew import fan_out_scan

    return fan_out_scan(
        scanned.select("content", "user", "folder", "filename")
    ).mapInPandas(_parse_batches, schema=PARSED_EMAIL)


def merge_parsed(parsed: DataFrame) -> DataFrame:
    """A1-A3: collapse to one row per ``dedupe_key``; first-writer-wins by
    walk order, ``mailboxes`` set-merged. Quarantined rows are excluded (the
    reference skips them before the upsert)."""
    clean = parsed.where(F.col("error").isNull())
    merged = dedup_merge(
        clean,
        key="dedupe_key",
        order_by=["user", "folder", "filename"],
        member_cols=["user", "folder", "filename"],
        payload_cols=[
            "message_id", "date", "from", "to", "cc", "bcc",
            "subject", "body", "attachments", "headers",
        ],
    )
    return (
        merged.withColumnRenamed("members", "mailboxes")
        .withColumn("entities", F.array().cast("array<struct<text:string,type:string>>"))
        .withColumn("thread_id", F.lit(None).cast("string"))
    )


def ingest_maildir(spark: SparkSession, base: str) -> DataFrame:
    """End-to-end batch ingest (the reference's ``ingest_enron.py`` §3.3):
    scan → parse → dedup-merge. Returns the unique-emails DataFrame."""
    return merge_parsed(parse_emails(scan_maildir(spark, base)))
