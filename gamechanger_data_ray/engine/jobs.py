"""Per-job status lifecycle rows — the crawler/pipeline job-status table
analog (``dataPipelines/gc_ingest/pipelines/core/steps.py:141-175``
inserts 'Crawl and Download Complete' / 'Ingest In Progress' / 'Ingest
Complete' rows per crawler+job; here every driver run appends status
events under the table it mutates).

Layout: one small JSON object per event at
``<table>/_jobs/<ts_ns>-<uuid>.json`` — append-only, atomic per event on
any store (no read-modify-write, so concurrent jobs never clobber), read
back sorted by timestamp. Events carry job_id / job_type / status /
wall-clock timestamps plus free-form fields (epochs applied, totals,
error strings).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from ..state.fs import StorageAdapter, default_fs

JOBS_DIR = "_jobs"

STATUS_STARTED = "In Progress"
STATUS_COMPLETED = "Complete"
STATUS_FAILED = "Failed"


def new_job_id(job_type: str) -> str:
    return f"{job_type}-{uuid.uuid4().hex[:12]}"


def record_status(
    table_dir: str,
    job_id: str,
    job_type: str,
    status: str,
    fs: StorageAdapter | None = None,
    **fields,
) -> None:
    """Append one status event (atomic single-object write)."""
    fs = default_fs(fs)
    d = os.path.join(table_dir, JOBS_DIR)
    fs.makedirs(d)
    ts = time.time()
    name = f"{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.json"
    fs.atomic_write_text(
        os.path.join(d, name),
        json.dumps(
            {"job_id": job_id, "job_type": job_type, "status": status,
             "ts": ts, **fields}
        ),
    )


def job_history(table_dir: str, fs: StorageAdapter | None = None) -> list[dict]:
    """All status events in timestamp order (file names are ts-prefixed)."""
    fs = default_fs(fs)
    d = os.path.join(table_dir, JOBS_DIR)
    out = []
    for f in fs.list_files(d, suffix=".json"):
        out.append(json.loads(fs.read_text(f)))
    return out


class JobStatus:
    """Context manager wrapping one driver run: Started on enter,
    Complete (with result fields) or Failed (with the error) on exit —
    mirroring the reference's per-step status inserts around the ingest
    steps."""

    def __init__(self, table_dir: str, job_type: str, fs: StorageAdapter | None = None, **fields):
        self.table_dir = table_dir
        self.job_type = job_type
        self.job_id = new_job_id(job_type)
        self.fs = fs
        self.fields = fields
        self.result_fields: dict = {}

    def __enter__(self) -> "JobStatus":
        record_status(
            self.table_dir, self.job_id, self.job_type, STATUS_STARTED,
            fs=self.fs, **self.fields,
        )
        return self

    def __exit__(self, exc_type, exc, _tb) -> bool:
        if exc_type is None:
            record_status(
                self.table_dir, self.job_id, self.job_type, STATUS_COMPLETED,
                fs=self.fs, **self.result_fields,
            )
        else:
            record_status(
                self.table_dir, self.job_id, self.job_type, STATUS_FAILED,
                fs=self.fs, error=f"{exc_type.__name__}: {exc}",
            )
        return False  # never swallow
