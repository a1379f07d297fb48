"""Snapshot-diff kernel — two states of one key space → change rows.

Reverse CDC: instead of applying a changelog to produce state, compare two
states and *synthesize* the changelog that transforms one into the other.
Reference analogs: the crawler alive-set revocation treats absence from the
newer snapshot as a delete event
(``dataPipelines/gc_crawler_status_tracker/gc_crawler_status_tracker.py:55-82``)
and manifest delete lists are diffs of "what exists" applied as removals
(``dataPipelines/scripts/manifest_delete.py:13-26``). Here the comparison is
generalized to full I/U/D emission over state tables.

Two output modes:

- ``"events"``: a replayable changelog. Inserted/updated keys emit the NEW
  state row **verbatim** (its stored ``op``/``lsn``/``seq`` provenance
  included), so LWW-applying the diff onto the old state reconverges to the
  new state *byte-identically* — the new row's ``(lsn, seq)`` beat the old
  row's in the real lineage, so it wins the merge too. Deleted keys emit a
  synthetic tombstone at ``(old row's lsn, TOMBSTONE_SEQ)`` — it strictly
  beats the old row (real seqs are far below the sentinel) while losing to
  any genuinely newer version a third state might hold. A ``change`` column
  labels each row insert/update/delete for consumers.

- ``"retractions"``: a Z-set delta (the incremental-view-maintenance form):
  old rows of deleted/updated keys with ``sign=-1``, new rows of
  inserted/updated keys with ``sign=+1``. Additive aggregates (count, sum)
  fold these signed rows directly — see ``engine/views.py``.

A key counts as *changed* iff its winning ``(lsn, seq)`` differs between the
two states: under LWW, the stored row is a pure function of the winning
event, so equal provenance ⇒ identical row (after both sides are conformed
to one schema), and differing provenance changes the stored ``lsn``/``seq``
columns themselves.

Pure Arrow — membership via hash-based ``pc.is_in`` on a composed
``key\\x00lsn\\x00seq`` identity string; no joins, no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schemas import KEY_COLUMN, OP_COLUMN, TOMBSTONE_OP

CHANGE_COLUMN = "change"
SIGN_COLUMN = "sign"

# Tombstone tie-break sentinel: beats any real event seq at the same lsn.
# The changelog generator and all engine paths assign seq << 2^62.
TOMBSTONE_SEQ = np.int64(1) << np.int64(62)


def _identity(t: pa.Table, key: str) -> pa.ChunkedArray:
    """``key\\x00lsn\\x00seq`` — the winning-event identity of each row."""
    return pc.binary_join_element_wise(
        pc.cast(t.column(key), pa.string()),
        pc.cast(t.column("lsn"), pa.string()),
        pc.cast(t.column("seq"), pa.string()),
        "\x00",
    )


def _as_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _empty_like(schema: pa.Schema) -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in schema})


def _tombstones_for(old_deleted: pa.Table, schema: pa.Schema, key: str) -> pa.Table:
    """Synthetic tombstone rows: key + op='D' + (old lsn, sentinel seq),
    every payload column null (mirrors a real delete event's shape)."""
    n = old_deleted.num_rows
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for f in schema:
        if f.name == key:
            cols[f.name] = old_deleted.column(key)
        elif f.name == OP_COLUMN:
            cols[f.name] = pa.array([TOMBSTONE_OP] * n, f.type)
        elif f.name == "lsn":
            cols[f.name] = pc.cast(old_deleted.column("lsn"), f.type)
        elif f.name == "seq":
            cols[f.name] = pa.array(np.full(n, TOMBSTONE_SEQ), f.type)
        else:
            cols[f.name] = pa.nulls(n, f.type)
    return pa.table(cols, schema=schema)


def diff_states(
    old: pa.Table | None,
    new: pa.Table | None,
    key: str = KEY_COLUMN,
    mode: str = "events",
) -> pa.Table:
    """Diff two conformed state tables (one hash partition, or any two
    same-schema key-unique tables). See module docstring for semantics.

    Either side may be ``None``/empty (pure-insert or pure-delete diffs).
    Output rows are sorted by ``key`` (ties: deletes after upserts), making
    the diff itself deterministic and byte-comparable.
    """
    if mode not in ("events", "retractions"):
        raise ValueError(f"unknown diff mode: {mode!r}")
    schema = (new if new is not None else old).schema
    extra = (
        pa.field(CHANGE_COLUMN, pa.string())
        if mode == "events"
        else pa.field(SIGN_COLUMN, pa.int8())
    )
    out_schema = pa.schema(list(schema) + [extra])
    old = old if old is not None and old.num_rows else None
    new = new if new is not None and new.num_rows else None
    if old is None and new is None:
        return _empty_like(out_schema)

    if old is not None and new is not None:
        old_keys, new_keys = _as_array(old.column(key)), _as_array(new.column(key))
        old_in_new = pc.is_in(old_keys, value_set=new_keys)
        new_in_old = pc.is_in(new_keys, value_set=old_keys)
        old_id, new_id = _as_array(_identity(old, key)), _as_array(_identity(new, key))
        same_row_old = pc.is_in(old_id, value_set=new_id)
        same_row_new = pc.is_in(new_id, value_set=old_id)
        deleted_mask = pc.invert(old_in_new)
        old_changed_mask = pc.and_(old_in_new, pc.invert(same_row_old))
        inserted_mask = pc.invert(new_in_old)
        new_changed_mask = pc.and_(new_in_old, pc.invert(same_row_new))
        old_deleted = old.filter(deleted_mask)
        old_changed = old.filter(old_changed_mask)
        new_inserted = new.filter(inserted_mask)
        new_changed = new.filter(new_changed_mask)
    elif old is None:
        old_deleted = old_changed = None
        new_inserted, new_changed = new, new.slice(0, 0)
    else:
        old_deleted, old_changed = old, old.slice(0, 0)
        new_inserted = new_changed = None

    parts: list[pa.Table] = []
    if mode == "events":
        if new_inserted is not None and new_inserted.num_rows:
            parts.append(new_inserted.append_column(
                CHANGE_COLUMN, pa.array(["insert"] * new_inserted.num_rows)))
        if new_changed is not None and new_changed.num_rows:
            parts.append(new_changed.append_column(
                CHANGE_COLUMN, pa.array(["update"] * new_changed.num_rows)))
        if old_deleted is not None and old_deleted.num_rows:
            parts.append(_tombstones_for(old_deleted, schema, key).append_column(
                CHANGE_COLUMN, pa.array(["delete"] * old_deleted.num_rows)))
    else:
        for t, sign in ((old_deleted, -1), (old_changed, -1),
                        (new_inserted, 1), (new_changed, 1)):
            if t is not None and t.num_rows:
                parts.append(t.append_column(
                    SIGN_COLUMN, pa.array(np.full(t.num_rows, sign, dtype=np.int8))))
    if not parts:
        return _empty_like(out_schema)
    out = pa.concat_tables([p.select(out_schema.names) for p in parts])
    order = pc.sort_indices(
        out, sort_keys=[(key, "ascending"), ("seq", "ascending")]
    )
    return out.take(order)
