"""Landing-zone staging + ingestion-job state (reference S3/S6).

Reference behaviors mirrored:

* ``stage_zip_to_tmp`` (``app/orchestrator.py:67-74``): archives are a
  *driver-side* concern — Spark has no zip source, so a zip is extracted
  into a landing directory and the distributed scan (S1 / the streaming
  file source) takes over from there. One upload ≈ one micro-batch.
* the ``jobs`` collection state machine (``app/main.py:22-28``,
  ``app/orchestrator.py:53-60``): QUEUED → PARSING → PARSED | EMPTY, plus
  ``file_count``. Kept as a tiny driver-side JSON-lines ledger — job state
  is metadata about the pipeline, not data *in* the pipeline; putting it
  through a 1000-executor shuffle would be cargo cult. ``StreamingQuery``
  progress covers the same need for continuous mode.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import tempfile
import uuid
import zipfile


def stage_zip(zip_path: str, landing_base: str | None = None) -> str:
    """Extract an archive into a fresh landing directory and return it.

    The extracted tree is then read by ``sources.maildir.scan_maildir`` (or
    any binaryFile scan). Paths are sanitized against zip-slip.
    """
    out = tempfile.mkdtemp(prefix="hgdb_stage_", dir=landing_base)
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            dest = os.path.realpath(os.path.join(out, member))
            if not dest.startswith(os.path.realpath(out) + os.sep) and dest != os.path.realpath(out):
                raise ValueError(f"zip member escapes landing dir: {member!r}")
        zf.extractall(out)
    return out


def cleanup_staging(path: str) -> None:
    """Remove a staged landing dir (reference ``cleanup_tmp``)."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)


class JobLedger:
    """Append-only JSON-lines job ledger with the reference's state machine.

    States: QUEUED → PARSING → (PARSED | EMPTY). Each transition appends a
    full snapshot; current state = last line per job id (idempotent replays
    are harmless, matching the at-least-once delivery posture).
    """

    STATES = ("QUEUED", "PARSING", "PARSED", "EMPTY")

    def __init__(self, path: str):
        self.path = path

    def new_job(self, source: str, input_dir: str) -> str:
        job_id = str(uuid.uuid4())
        self._append({
            "_id": job_id,
            "created_at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "status": "QUEUED",
            "source": source,
            "input_dir": input_dir,
            "file_count": None,
        })
        return job_id

    def set_status(self, job_id: str, status: str,
                   file_count: int | None = None) -> None:
        if status not in self.STATES:
            raise ValueError(f"unknown status {status!r}")
        cur = self.get(job_id)
        if cur is None:
            raise KeyError(job_id)
        cur.update({"status": status})
        if file_count is not None:
            cur["file_count"] = file_count
        self._append(cur)

    def get(self, job_id: str) -> dict | None:
        latest = None
        if not os.path.exists(self.path):
            return None
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                row = json.loads(line)
                if row["_id"] == job_id:
                    latest = row
        return latest

    def _append(self, row: dict) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")
