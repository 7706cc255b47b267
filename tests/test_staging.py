"""Staging + job-ledger tests (reference S3/S6), incl. end-to-end
zip → landing dir → maildir ingest."""

from __future__ import annotations

import zipfile

import pytest

from hierarchical_graph_db_spark.sources.maildir import ingest_maildir
from hierarchical_graph_db_spark.sources.staging import (
    JobLedger,
    cleanup_staging,
    stage_zip,
)


def test_zip_stage_and_ingest(spark, tmp_path):
    zp = tmp_path / "upload.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("u1/inbox/1_", "Message-ID: <z1>\nSubject: a\n\nbody a")
        zf.writestr("u2/sent/2_", "Message-ID: <z2>\nSubject: b\n\nbody b")
    landing = stage_zip(str(zp), str(tmp_path))
    try:
        merged = {r["dedupe_key"]: r for r in ingest_maildir(spark, landing).collect()}
        assert set(merged) == {"<z1>", "<z2>"}
        assert merged["<z1>"]["mailboxes"][0]["user"] == "u1"
    finally:
        cleanup_staging(landing)


def test_zip_slip_rejected(tmp_path):
    zp = tmp_path / "evil.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("../../escape.txt", "nope")
    with pytest.raises(ValueError, match="escapes"):
        stage_zip(str(zp), str(tmp_path))


def test_job_ledger_state_machine(tmp_path):
    ledger = JobLedger(str(tmp_path / "jobs.jsonl"))
    jid = ledger.new_job(source="upload", input_dir="/landing/x")
    assert ledger.get(jid)["status"] == "QUEUED"
    ledger.set_status(jid, "PARSING", file_count=42)
    ledger.set_status(jid, "PARSED")
    final = ledger.get(jid)
    assert final["status"] == "PARSED" and final["file_count"] == 42
    assert ledger.get("missing") is None
    with pytest.raises(ValueError):
        ledger.set_status(jid, "BOGUS")
