"""Debezium-shaped CDC envelope source: JSONL change events → engine events.

The reference tails its change feed as re-uploaded S3 snapshot batches
(``dataPipelines/gc_ingest/tools/checkpoint/README.md:5-9``); real CDC
deployments tail a Debezium/WAL topic instead, where each record is an
envelope::

    {"op": "c"|"r"|"u"|"d",
     "before": {...row image...} | null,
     "after":  {...row image...} | null,
     "source": {"lsn": <int64>, ...},
     "ts_ms":  <int64>,
     "seq":    <int64, optional intra-lsn tiebreak>}

This module parses that shape into the engine's canonical change-event
columns (``op`` I/U/D, ``lsn``, ``seq``, ``doc_id`` + payload) fully
vectorized — pyarrow's C++ JSON reader does the parse, ``pc.struct_field``
does the flatten; no Python loop over rows — and hands the result to
:func:`gamechanger_data_ray.engine.cdc.apply_events_dataset`, so envelope
replay gets the identical exactly-once / LWW / schema-evolution semantics
as native epoch replay.

Op mapping: ``c`` (create) and ``r`` (snapshot read) → I, ``u`` → U,
``d`` → D. Deletes carry their key in ``before``; the payload columns of a
delete are null (the merge writes a tombstone, ``core/merge.py``).

Total order: ``(lsn, seq)``. ``lsn`` comes from ``source.lsn`` (falling
back to top-level ``ts_ms`` when absent); ``seq`` from the optional
top-level ``seq`` field, else 0 — Debezium LSNs are unique per event, so
the fallback is collision-free in practice; producers that batch multiple
events per LSN must emit ``seq``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj
import ray.data

from ..state.fs import StorageAdapter, default_fs

_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def _struct_field(t: pa.Table, col: str, field: str) -> pa.ChunkedArray | None:
    """``t[col].field`` as a column of nulls-if-absent; None when the
    column itself is missing (e.g. an all-insert file with no ``before``)."""
    if col not in t.column_names:
        return None
    arr = t[col]
    if not pa.types.is_struct(arr.type):
        return None  # all-null column inferred as null type
    if arr.type.get_field_index(field) < 0:
        return None
    return pc.struct_field(arr, field)


def _coalesce(*arrays, length: int, dtype: pa.DataType):
    present = [a for a in arrays if a is not None]
    if not present:
        return pa.nulls(length, dtype)
    if len(present) == 1:
        return present[0]
    return pc.coalesce(*present)


def parse_envelope_table(t: pa.Table, payload_fields: list[str]) -> pa.Table:
    """One parsed-JSON envelope batch → canonical change-event columns.

    ``payload_fields`` are the row-image columns to surface (e.g.
    ``["version_hash", "tokens", "n_tok", "source"]`` for the tokens
    table — ``doc_id`` is always extracted and need not be listed).
    """
    n = len(t)
    op_raw = t["op"] if "op" in t.column_names else pa.nulls(n, pa.string())
    op = pc.case_when(
        pc.make_struct(
            pc.is_in(op_raw, value_set=pa.array(["c", "r"])),
            pc.equal(op_raw, "u"),
            pc.equal(op_raw, "d"),
        ),
        "I", "U", "D",
    )
    if op.null_count:
        bad = pc.filter(op_raw, pc.is_null(op))[:5].to_pylist()
        raise ValueError(f"unknown envelope op values: {bad}")

    lsn = _coalesce(
        _struct_field(t, "source", "lsn"),
        t["ts_ms"] if "ts_ms" in t.column_names else None,
        length=n, dtype=pa.int64(),
    )
    if pc.any(pc.is_null(lsn)).as_py():
        raise ValueError("envelope missing both source.lsn and ts_ms")
    seq = (
        t["seq"] if "seq" in t.column_names
        else pa.nulls(n, pa.int64())
    )
    seq = pc.fill_null(pc.cast(seq, pa.int64()), 0)

    doc_id = _coalesce(
        _struct_field(t, "after", "doc_id"),
        _struct_field(t, "before", "doc_id"),
        length=n, dtype=pa.string(),
    )
    if pc.any(pc.is_null(doc_id)).as_py():
        raise ValueError("envelope with no doc_id in either row image")

    reserved = {"op", "lsn", "seq", "doc_id"} & set(payload_fields)
    if reserved:
        raise ValueError(
            f"payload fields {sorted(reserved)} collide with canonical "
            "change-event columns; strip provenance from the row images"
        )
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "op": op,
        "lsn": pc.cast(lsn, pa.int64()),
        "seq": seq,
        "doc_id": doc_id,
    }
    # payload comes from `after` only: deletes (before-image only) keep
    # null payload so the merge writes a tombstone, not a resurrected row.
    for f in payload_fields:
        v = _struct_field(t, "after", f)
        cols[f] = v if v is not None else pa.nulls(n, pa.null())
    return pa.table(cols)


def _probe(path: str, fs: StorageAdapter) -> pa.Table:
    """Driver-side parse of ONE envelope file — the schema probe, not the
    data path (envelope files are epoch-sized segments, not the corpus)."""
    with fs.fs.open_input_stream(path) as f:
        return pj.read_json(f)


def infer_payload_fields(path: str, fs: StorageAdapter | None = None) -> list[str]:
    """Payload column names from one envelope file's ``after`` images."""
    head = _probe(path, default_fs(fs))
    if "after" not in head.column_names or not pa.types.is_struct(head["after"].type):
        raise ValueError(f"{path}: no struct 'after' images to infer payload from")
    return [f.name for f in head["after"].type if f.name != "doc_id"]


def read_envelopes(
    paths: list[str],
    payload_fields: list[str] | None = None,
    fs: StorageAdapter | None = None,
) -> ray.data.Dataset:
    """JSONL envelope files → streaming Dataset of canonical change events.

    The JSON parse runs in Ray read tasks (pyarrow C++ reader via
    ``ray.data.read_json``); the envelope flatten is a zero-copy-in
    ``map_batches`` over Arrow.
    """
    fs = default_fs(fs)
    if payload_fields is None:
        payload_fields = infer_payload_fields(paths[0], fs)
    fields = list(payload_fields)

    ds = ray.data.read_json(paths, filesystem=fs.fs, file_extensions=None)
    return ds.map_batches(
        lambda t: parse_envelope_table(t, fields), batch_format="pyarrow"
    )


def apply_envelopes(
    paths: list[str],
    table_dir: str,
    epoch: int,
    payload_fields: list[str] | None = None,
    payload_schema: pa.Schema | None = None,
    num_partitions: int = 32,
    fs: StorageAdapter | None = None,
    update_mode: str = "replace",
):
    """Replay JSONL envelope files into the lake table as ``epoch``.

    ``update_mode="coalesce"`` treats envelopes as PARTIAL images
    (Debezium patch semantics): an ``after`` that omits a field leaves
    that column untouched instead of nulling it.

    Same exactly-once contract as native replay: if ``epoch`` is at or
    below the committed checkpoint this is a no-op (returns None), so a
    crashed run can re-apply the same files safely.

    ``payload_schema`` (optional) declares the true payload types when
    JSON inference is too wide — e.g. ``tokens: list<int32>`` where JSON
    yields ``list<int64>``; the declared columns are cast inside the same
    map pass (per-batch, streaming — not a separate pipeline).
    """
    from ..engine.cdc import apply_events_dataset

    fs = default_fs(fs)
    if payload_fields is None:
        payload_fields = infer_payload_fields(paths[0], fs)
    events = read_envelopes(paths, payload_fields, fs)
    if payload_schema is not None:
        target = {f.name: f.type for f in payload_schema}

        def cast_payload(t: pa.Table) -> pa.Table:
            for name, typ in target.items():
                if name in t.column_names and not t[name].type.equals(typ):
                    i = t.schema.get_field_index(name)
                    t = t.set_column(i, name, pc.cast(t[name], typ))
            return t

        events = events.map_batches(cast_payload, batch_format="pyarrow")

    base = pa.schema(
        [("op", pa.string()), ("lsn", pa.int64()), ("seq", pa.int64()),
         ("doc_id", pa.string())]
    )
    if payload_schema is not None:
        payload_types = {f.name: f.type for f in payload_schema}
    else:
        # derive payload types from the probe file's inferred JSON schema
        probe = parse_envelope_table(_probe(paths[0], fs), payload_fields)
        payload_types = {
            f: probe.schema.field(probe.schema.get_field_index(f)).type
            for f in payload_fields
        }
    incoming = pa.schema(
        list(base) + [pa.field(f, payload_types[f]) for f in payload_fields]
    )
    return apply_events_dataset(
        events, table_dir, epoch, incoming,
        num_partitions=num_partitions, fs=fs, update_mode=update_mode,
    )


# ---------------------------------------------------------------------------
# Outbound: publish the lake's own change feed as envelopes
# ---------------------------------------------------------------------------

_CHANGE_TO_OP = {"insert": "c", "update": "u", "delete": "d"}


def _change_rows_to_envelopes(t: pa.Table) -> pa.Table:
    """Diff change rows (``engine/diff.py`` mode="events") → envelope rows.

    Nested structs (before/after/source) are built columnar with
    ``pa.StructArray.from_arrays`` + per-row null masks — no Python loop;
    ``Dataset.write_json`` then serializes each row as one JSONL envelope.
    """
    n = len(t)
    change = t["change"]
    op = pc.case_when(
        pc.make_struct(
            pc.equal(change, "insert"), pc.equal(change, "update"),
            pc.equal(change, "delete"),
        ),
        "c", "u", "d",
    )
    is_del = pc.equal(change, "delete")
    payload_names = [
        c for c in t.column_names if c not in ("op", "lsn", "seq", "change")
    ]
    image_cols = [t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
                  for c in ["doc_id", *[c for c in payload_names if c != "doc_id"]]]
    image_names = ["doc_id", *[c for c in payload_names if c != "doc_id"]]
    after = pa.StructArray.from_arrays(
        image_cols, names=image_names, mask=is_del.combine_chunks()
        if isinstance(is_del, pa.ChunkedArray) else is_del,
    )
    not_del = pc.invert(is_del)
    doc = t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]
    before = pa.StructArray.from_arrays(
        [doc], names=["doc_id"],
        mask=not_del.combine_chunks() if isinstance(not_del, pa.ChunkedArray) else not_del,
    )
    lsn = pc.cast(t["lsn"], pa.int64()).combine_chunks()
    source = pa.StructArray.from_arrays([lsn], names=["lsn"])
    return pa.table({
        "op": op,
        "before": before,
        "after": after,
        "source": source,
        "seq": pc.cast(t["seq"], pa.int64()),
        "ts_ms": lsn,  # deterministic stand-in: producers stamp wall time
    })


def publish_envelopes(
    table_dir: str,
    out_dir: str,
    from_epoch: int,
    to_epoch: int | None = None,
    fs: StorageAdapter | None = None,
) -> None:
    """Publish the I/U/D diff between two committed epochs as Debezium-shaped
    JSONL — the outbound half of the CDC loop (a downstream consumer that
    can't read manifests tails these files instead). Zero-shuffle: rides
    ``diff_table_epochs``'s partition-aligned two-file diff tasks, and the
    output is one JSONL shard per diff block (resumable, never one giant
    file). Closure (tested): ``apply_envelopes`` of the published feed onto
    the ``from_epoch`` state reconverges to the ``to_epoch`` state."""
    from ..engine.diff import diff_table_epochs

    fs = default_fs(fs)
    ds = diff_table_epochs(table_dir, from_epoch, to_epoch, mode="events", fs=fs)
    ds.map_batches(_change_rows_to_envelopes, batch_format="pyarrow").write_json(
        out_dir, filesystem=fs.fs
    )
