"""Last-writer-wins merge kernel — pure Arrow + numpy, no Ray.

Semantics are the reference's corpus-snapshot view
(``dataPipelines/gc_db_utils/orch/sql/create_views.sql:16-44``): the latest
``versioned_docs`` row per publication wins
(``MAX(batch_timestamp) OVER (PARTITION BY pub_id)``), revoked/deleted keys
drop out. The reference tie-breaks equal timestamps arbitrarily via
DISTINCT (``create_views.sql:24``); we define the deterministic total order
``(lsn DESC, seq DESC)``.

The reduce is associative: LWW(LWW(partials)) == LWW(whole), tombstones
included — which is what lets the engine pre-reduce inside ``map_batches``
(a combiner) before the hash shuffle, the salted-split answer to hot keys.

All kernels are vectorized: sort_indices + dictionary-encode +
numpy first-occurrence; no Python-per-row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schemas import (
    KEY_COLUMN,
    OP_COLUMN,
    ORDER_COLUMNS,
    ORIGIN_COLUMN,
    TOMBSTONE_OP,
)


def lww_reduce(
    t: pa.Table,
    key: str = KEY_COLUMN,
    order: tuple[str, ...] = ORDER_COLUMNS,
) -> pa.Table:
    """Keep, per ``key``, the single row that wins the ``order`` total order
    (highest wins; ties impossible when (lsn, seq) is a total order — if
    duplicate deliveries repeat the exact (lsn, seq), the first after the
    stable sort wins deterministically).

    Tombstone rows are KEPT — a tombstone must survive partial reduces so it
    can delete state downstream. Filter with :func:`drop_tombstones` at the
    end of the full merge.
    """
    if t.num_rows == 0:
        return t
    sort_keys = [(c, "descending") for c in order]
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    t = t.take(idx).combine_chunks()
    codes = pc.dictionary_encode(t.column(key))
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    ind = codes.indices.to_numpy(zero_copy_only=False)
    # first occurrence of each key code in descending-(lsn,seq) order = winner
    _, first = np.unique(ind, return_index=True)
    first.sort()
    return t.take(pa.array(first, type=pa.int64()))


EVENTS_REP = "_events_rep"  # raw events collapsed into this reduced row
TOMBS_REP = "_tombs_rep"  # raw tombstone events collapsed into it


def lww_reduce_weighted(
    t: pa.Table,
    key: str = KEY_COLUMN,
    order: tuple[str, ...] = ORDER_COLUMNS,
) -> pa.Table:
    """:func:`lww_reduce` that also attaches per-winner weight columns
    counting how many raw events (and how many tombstones) were collapsed —
    so lineage counters stay exact through the combiner. Weights compose:
    if ``t`` already carries weight columns (a reduce of reduced partials),
    they are summed per key instead of counted."""
    if t.num_rows == 0:
        return t
    sort_keys = [(c, "descending") for c in order]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys)).combine_chunks()
    codes = pc.dictionary_encode(t.column(key))
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    ind = codes.indices.to_numpy(zero_copy_only=False)
    ncodes = int(ind.max()) + 1
    if EVENTS_REP in t.schema.names:
        w = t.column(EVENTS_REP).to_numpy(zero_copy_only=False)
        wt = t.column(TOMBS_REP).to_numpy(zero_copy_only=False)
        t = t.drop_columns([EVENTS_REP, TOMBS_REP])
    else:
        w = np.ones(t.num_rows, dtype=np.int64)
        wt = (
            pc.equal(t.column(OP_COLUMN), pa.scalar(TOMBSTONE_OP))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    events_per_key = np.bincount(ind, weights=w, minlength=ncodes).astype(np.int64)
    tombs_per_key = np.bincount(ind, weights=wt, minlength=ncodes).astype(np.int64)
    _, first = np.unique(ind, return_index=True)
    first.sort()
    out = t.take(pa.array(first, type=pa.int64()))
    win_codes = ind[first]
    out = out.append_column(EVENTS_REP, pa.array(events_per_key[win_codes]))
    out = out.append_column(TOMBS_REP, pa.array(tombs_per_key[win_codes]))
    return out


def drop_tombstones(t: pa.Table, op: str = OP_COLUMN) -> pa.Table:
    """Remove rows whose winning op is a delete."""
    if t.num_rows == 0:
        return t
    return t.filter(pc.not_equal(t.column(op), pa.scalar(TOMBSTONE_OP)))


def collapse_deltas(tables: list[pa.Table], sort_by_key: bool = True) -> pa.Table:
    """Resolve a merge-on-read partition — base state + ordered delta files
    (delta rows carry their real (lsn, seq), so plain LWW is the resolver;
    delta tombstones suppress base rows and then drop out). Single-table
    fast path: a copy-on-write partition is already resolved."""
    if not tables:
        return pa.table({})
    if len(tables) == 1:
        # a lone delta file (partition born in delta mode) still carries
        # tombstone rows; a copy-on-write base never does (cheap no-op)
        return drop_tombstones(tables[0]) if OP_COLUMN in tables[0].schema.names else tables[0]
    out = drop_tombstones(lww_reduce(pa.concat_tables(tables, promote_options="default")))
    if sort_by_key and out.num_rows:
        out = out.take(pc.sort_indices(out, sort_keys=[(KEY_COLUMN, "ascending")]))
    return out


def merge_partition(
    state: pa.Table | None,
    events: pa.Table,
    sort_output_by_key: bool = True,
) -> tuple[pa.Table, dict[str, int]]:
    """Merge one hash partition: current ``state`` rows + this epoch's
    ``events`` (both already conformed to one unified schema, with ``state``
    rows carrying op='I'/their stored provenance) → new partition rows +
    lineage counters.

    Counters (reference analog: success/error counters of the ES bulk
    loader, ``gc_elasticsearch_publisher.py:105-128``):
      events_in, upserts (event row won a key), deletes (key present in
      state removed by a tombstone), tombstones (D events seen), rows_out,
      watermark_lsn (max lsn seen).
    """
    if EVENTS_REP in events.schema.names:
        events_in = int(pc.sum(events.column(EVENTS_REP)).as_py() or 0)
        tombstones = int(pc.sum(events.column(TOMBS_REP)).as_py() or 0)
        events = events.drop_columns([EVENTS_REP, TOMBS_REP])
    else:
        events_in = events.num_rows
        tombstones = (
            int(
                pc.sum(
                    pc.cast(
                        pc.equal(events.column(OP_COLUMN), pa.scalar(TOMBSTONE_OP)), pa.int64()
                    )
                ).as_py()
                or 0
            )
            if events.num_rows
            else 0
        )
    counters = {
        "events_in": events_in,
        "tombstones": tombstones,
        "upserts": 0,
        "deletes": 0,
        "rows_out": 0,
        "watermark_lsn": int(pc.max(events.column("lsn")).as_py() or 0) if events.num_rows else 0,
    }

    if state is not None and state.num_rows:
        state = state.append_column(
            ORIGIN_COLUMN, pa.array(np.zeros(state.num_rows, dtype=np.int8))
        )
        events = events.append_column(
            ORIGIN_COLUMN, pa.array(np.ones(events.num_rows, dtype=np.int8))
        )
        state_keys = set(state.column(KEY_COLUMN).to_pylist())
        both = pa.concat_tables([state, events], promote_options="default")
    else:
        state_keys = set()
        events = events.append_column(
            ORIGIN_COLUMN, pa.array(np.ones(events.num_rows, dtype=np.int8))
        )
        both = events

    won = lww_reduce(both)
    if won.num_rows:
        from_event = pc.equal(won.column(ORIGIN_COLUMN), pa.scalar(1, pa.int8()))
        is_del = pc.equal(won.column(OP_COLUMN), pa.scalar(TOMBSTONE_OP))
        counters["upserts"] = int(
            pc.sum(pc.cast(pc.and_(from_event, pc.invert(is_del)), pa.int64())).as_py() or 0
        )
        if state_keys:
            del_keys = won.filter(pc.and_(from_event, is_del)).column(KEY_COLUMN).to_pylist()
            counters["deletes"] = sum(1 for k in del_keys if k in state_keys)

    out = drop_tombstones(won)
    out = out.drop_columns([ORIGIN_COLUMN])
    if sort_output_by_key and out.num_rows:
        out = out.take(pc.sort_indices(out, sort_keys=[(KEY_COLUMN, "ascending")]))
    counters["rows_out"] = out.num_rows
    return out, counters
