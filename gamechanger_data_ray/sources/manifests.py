"""Manifest sources — the explicit change-event inputs of the reference.

- I/U/D CSV manifest (S7): the reference drives per-row insert/delete from a
  CSV with a ``Process`` column ∈ {Insert, Delete}
  (``dataPipelines/gc_ingest/pipelines/core/configs.py:593-636``). Here:
  ``read_iud_manifest`` normalizes such a CSV into changelog-event rows.
- Crawler-output JSONL (S6): one JSON object per crawled doc; defines the
  per-source alive set — docs of a covered source ABSENT from it are
  revoked (``gc_crawler_status_tracker.py:24-37, 55-82``). Here:
  ``alive_sets`` + ``revocation_events`` produce tombstone events, making
  absence an explicit event the LWW merge can apply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

OP_MAP = {"Insert": "I", "Update": "U", "Delete": "D"}


def read_iud_manifest(
    path: str, lsn: int, key_col: str = "doc_id", process_col: str = "Process"
) -> ray.data.Dataset:
    """CSV manifest → normalized change events (op, lsn, seq, doc_id, ...).

    ``seq`` is the manifest row number (deterministic within the manifest);
    unknown Process values raise — malformed events must not be silently
    dropped (the reference exits on empty/invalid input,
    ``pipelines/core/cli.py:45-47``).

    Manifests are control-plane small, so the CSV is read ONCE on the
    caller (deterministic file order — Ray's streaming executor does NOT
    preserve block order by default, so deriving ``seq`` from
    ``Dataset.to_pandas()`` would number rows nondeterministically) and
    handed to Ray as a single in-order block."""
    import pyarrow.csv as pacsv

    from ..state.fs import default_fs

    fs = default_fs(None)
    with fs.fs.open_input_stream(path) as f:
        t = pacsv.read_csv(f)

    procs = t[process_col].to_pylist()
    bad = [p for p in procs if p not in OP_MAP]
    if bad:
        raise ValueError(f"unknown Process values in manifest: {sorted(set(bad))[:5]}")
    ops = pa.array([OP_MAP[p] for p in procs])
    t = t.drop_columns([process_col])
    t = t.add_column(0, "op", ops)
    t = t.add_column(1, "lsn", pa.array([lsn] * t.num_rows, pa.int64()))
    t = t.add_column(2, "seq", pa.array(np.arange(t.num_rows, dtype=np.int64)))
    return ray.data.from_arrow(t)


def alive_sets(crawl_manifest: pd.DataFrame) -> dict[str, set]:
    """(source, doc_id) alive pairs → {source: {doc_id, ...}} (FIXTURES F5)."""
    missing = {"source", "doc_id"} - set(crawl_manifest.columns)
    if missing:
        raise ValueError(
            f"alive-pairs manifest must have columns source,doc_id; missing {sorted(missing)} "
            f"(got {list(crawl_manifest.columns)})"
        )
    return {
        s: set(g["doc_id"].tolist()) for s, g in crawl_manifest.groupby("source")
    }


def revocation_events(
    table_ds: ray.data.Dataset,
    alive_ref,
    lsn: int,
    key_col: str = "doc_id",
    source_col: str = "source",
) -> ray.data.Dataset:
    """Anti-join the current table against the broadcast alive sets: rows of
    a COVERED source whose key is absent become tombstone events (absence is
    an event — J3). Sources not in the crawl are untouched."""

    def make_tombstones(t: pa.Table) -> pa.Table:
        alive: dict[str, set] = ray.get(alive_ref)
        srcs = t[source_col].to_pylist()
        keys = t[key_col].to_pylist()
        dead_idx = [
            i
            for i, (s, k) in enumerate(zip(srcs, keys))
            if s in alive and k not in alive[s]
        ]
        dead = t.take(pa.array(dead_idx, pa.int64()))
        n = dead.num_rows
        return pa.table(
            {
                "op": pa.array(["D"] * n),
                "lsn": pa.array([lsn] * n, pa.int64()),
                # one tombstone per key per sweep → seq=0 is a total order
                "seq": pa.array([0] * n, pa.int64()),
                key_col: dead[key_col],
                source_col: dead[source_col],
            }
        )

    return table_ds.map_batches(make_tombstones, batch_format="pyarrow")
