"""CDC token lake → packed training shards.

The bridge between the engine (a continuously-upserted table of
pre-tokenized sequences) and the training dataloader (fixed-length packed
chunks): export the committed snapshot as concat-and-chunk ``cap``-length
sequences — documents split across chunk boundaries, nothing padded,
nothing dropped — the reference's corpus-export jobs
(``dataPipelines/gc_ingest/pipelines/core/cli.py:152-237`` re-derive
downstream artifacts from the lake the same way) recast for a token lake.

Determinism: the global document order is **(partition id, doc_id)**.
Partition files are committed doc_id-sorted under a pinned hash modulus,
so the same committed ``(epoch, rev)`` always yields byte-identical
chunks — across re-runs, and across physical layouts (a merge-on-read
stack exports the same bytes as its compacted rewrite; tested).

Scale shape: two passes, neither materializes the corpus —

- pass 1 reads ONLY the skinny merge columns + ``n_tok`` per partition
  (column projection holds even under merge-on-read) and prefix-sums the
  O(P) per-partition token totals on the driver;
- pass 2 re-reads resolved partitions; each document slices itself into
  chunk pieces at global offsets (numpy, one iteration per doc), and a
  chunk-range groupby assembles 64 chunks per task
  (``pipelines/tokens.py::chunk_sized_tokens``, the shared kernel).

Output is partitioned parquet plus an ``_EXPORT.json`` ready marker
(same consumer-gating pattern as the changelog's ``_MANIFEST.json``):
a crashed export leaves no marker and a re-run into a fresh dir is the
recovery path.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..state import manifest as mf
from ..state.fs import StorageAdapter, default_fs
from .cdc import _load_state

EXPORT_MARKER = "_EXPORT.json"

# skinny pass-1 projection: what LWW resolution needs + the length column
_SIZE_COLUMNS = ["op", "lsn", "seq", "doc_id", "n_tok"]


def _partition_work(table_dir: str, cur: mf.TableManifest) -> list[dict]:
    work = []
    for p in sorted(cur.partitions, key=int):
        e = cur.partitions[p]
        rels = ([e["file"]] if e.get("file") else []) + list(e.get("deltas", ()))
        if rels and e.get("rows"):
            work.append({"part": int(p), "files": rels})
    return work


def export_training(
    table_dir: str,
    out_dir: str,
    cap: int = 2048,
    fs: StorageAdapter | None = None,
    epoch: int | str | None = None,
) -> dict[str, Any]:
    """Export the committed table's token streams as packed ``cap``-length
    training chunks under ``out_dir`` (parquet + ``_EXPORT.json`` marker).
    Returns the marker dict. Refuses an ``out_dir`` that already carries a
    completed export (immutable artifacts; export to a fresh dir).

    ``epoch`` (an int or a snapshot tag name) exports AS OF that retained
    manifest — tag a training release once, re-export its byte-identical
    chunks forever, however far the live table has moved on."""
    from ..pipelines.tokens import chunk_sized_tokens
    from .cdc import _resolve_manifest

    fs = default_fs(fs)
    cur = _resolve_manifest(table_dir, epoch, fs)
    if cur is None:
        raise FileNotFoundError(f"no committed table at {table_dir}")
    for need in ("tokens", "n_tok"):
        if need not in cur.schema.names:
            raise ValueError(f"table has no {need!r} column: {cur.schema.names}")
    if fs.exists(os.path.join(out_dir, EXPORT_MARKER)):
        raise FileExistsError(
            f"completed export already at {out_dir}; export to a fresh dir")
    debris = fs.list_files(out_dir)
    if debris:
        # a crashed export left files but no marker: re-running into the
        # same dir would MERGE stale chunks into the new export (duplicate
        # chunk_ids read back as silently corrupt training data)
        raise FileExistsError(
            f"{out_dir} holds {len(debris)} file(s) from an incomplete "
            "export; remove them or export to a fresh dir")
    work = _partition_work(table_dir, cur)
    b64 = cur.schema_b64

    def totals(batch: pa.Table) -> pa.Table:
        schema = mf.schema_from_b64(b64)
        buckets, tots = [], []
        for row in batch.to_pylist():
            t = _load_state(table_dir, row["files"], schema, fs,
                            columns=[c for c in _SIZE_COLUMNS
                                     if c in schema.names])
            buckets.append(row["part"])
            tots.append(int(pc.sum(t["n_tok"]).as_py() or 0) if t is not None
                        and t.num_rows else 0)
        return pa.table({"bucket": pa.array(buckets, pa.int64()),
                         "total": pa.array(tots, pa.int64())})

    per_bucket = pd.DataFrame({"bucket": [], "total": []}) if not work else (
        ray.data.from_items(work)
        .map_batches(totals, batch_size=1, batch_format="pyarrow",
                     retry_exceptions=True, max_retries=4)
        .to_pandas()  # O(P) rows
    )
    total_tokens = int(per_bucket["total"].sum()) if len(per_bucket) else 0

    def sized(batch: pa.Table) -> pa.Table:
        schema = mf.schema_from_b64(b64)
        outs = []
        for row in batch.to_pylist():
            t = _load_state(table_dir, row["files"], schema, fs)
            if t is None or t.num_rows == 0:
                continue
            outs.append(pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.string()),
                "tokens": t["tokens"],
                "n_tok": pc.cast(t["n_tok"], pa.int64()),
                "bucket": pa.array([row["part"]] * t.num_rows, pa.int64()),
            }))
        if not outs:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "tokens": pa.array([], pa.list_(pa.int32())),
                             "n_tok": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        return pa.concat_tables(outs, promote_options="default")

    if work:
        stream = ray.data.from_items(work).map_batches(
            sized, batch_size=1, batch_format="pyarrow",
            retry_exceptions=True, max_retries=4)
        chunks = chunk_sized_tokens(stream, cap, per_bucket=per_bucket)
        chunks.write_parquet(out_dir, filesystem=fs.fs)  # same FS as the marker
    marker = {
        "table": table_dir,
        "epoch": cur.epoch,
        "rev": cur.rev,
        "cap": cap,
        "total_tokens": total_tokens,
        "chunks": -(-total_tokens // cap) if total_tokens else 0,
        "docs": sum(int(e.get("rows", 0)) for e in cur.partitions.values()),
    }
    fs.makedirs(out_dir)
    fs.atomic_write_bytes(os.path.join(out_dir, EXPORT_MARKER),
                          json.dumps(marker).encode())
    return marker


def read_training_export(
    out_dir: str, fs: StorageAdapter | None = None
) -> ray.data.Dataset:
    """The exported chunks as a Dataset — gated on the ready marker, so a
    half-written export is invisible to consumers."""
    fs = default_fs(fs)
    if not fs.exists(os.path.join(out_dir, EXPORT_MARKER)):
        raise FileNotFoundError(f"no completed export at {out_dir}")
    return ray.data.read_parquet(out_dir, filesystem=fs.fs,
                                 file_extensions=["parquet"])
