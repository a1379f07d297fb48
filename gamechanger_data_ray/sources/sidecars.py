"""Sidecar + JSONL sources.

- ``attach_metadata_sidecars``: the reference pairs every raw doc with a
  ``<file>.metadata`` JSON sidecar read permissively
  (``common/document_parser/lib/read_meta.py:5-24``, empty-dict fallback)
  and joins them by filename stem (J1, ``load/utils.py:157-221``). Here the
  sidecar fields become columns on the binary-file Dataset at read time —
  the at-scale form of the file-pair join (co-resident columns, no join).
- ``read_crawler_jsonl``: crawler-output JSONL (S6,
  ``gc_crawler_status_tracker.py:24-37``) — one JSON object per line,
  undecodable lines skipped with a counter, yields (source, doc_id, ...)
  rows that feed the alive-set/revocation sweep.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import ray.data


def read_metadata_sidecar(path: str) -> dict:
    """Permissive single-sidecar read (``read_meta.py:5-24`` parity):
    missing / malformed → empty dict, never an exception."""
    try:
        with open(path) as f:
            out = json.load(f)
        return out if isinstance(out, dict) else {}
    except (OSError, json.JSONDecodeError):
        return {}


def attach_metadata_sidecars(
    data_dir: str,
    file_extensions: list[str] | None = None,
    fields: list[str] | None = None,
) -> ray.data.Dataset:
    """Read binary docs + their ``<name>.metadata`` sidecars as one Dataset
    with payload and metadata columns co-resident (the J1 4-way stem join
    collapsed into read-time columns).

    Pass ``fields`` to pin the metadata schema across batches (docs without
    a sidecar get nulls). With ``fields=None`` columns are discovered
    per-batch — schema-on-read, fine for homogeneous sidecars but batches
    of sidecar-less files produce narrower blocks."""
    ds = ray.data.read_binary_files(
        data_dir, include_paths=True, file_extensions=file_extensions
    )

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        metas = [read_metadata_sidecar(p + ".metadata") for p in batch["path"]]
        batch["doc_name"] = [os.path.basename(p) for p in batch["path"]]
        keys = fields or sorted({k for m in metas for k in m})
        for k in keys:
            batch[k] = [m.get(k) for m in metas]
        return batch

    return ds.map_batches(attach, batch_format="pandas")


def read_crawler_jsonl(path: str) -> tuple[ray.data.Dataset, int]:
    """JSONL of crawl records → Dataset; undecodable lines are counted and
    skipped (``gc_crawler_status_tracker.py:33-35`` skips on decode error).
    Returns (dataset, n_bad_lines)."""
    rows, bad = [], 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                bad += 1
    if not rows:
        return ray.data.from_items([]), bad
    return ray.data.from_pandas(pd.DataFrame(rows)), bad
