"""Incrementally-maintained EXACT-duplicate (content-hash) index over a
CDC table of tokenized documents.

The reference dedups at ingest by exact content checksum — skip-if-seen
over a hash set (``dataPipelines/rpa/rpa_landing_zone_mover.py:100-129``,
``common/utils/text_utils.py`` checksum paths) — which is a full rescan
or an ever-growing driver-side set at lake scale. This module maintains
the checksum set as a transform view (the same MAP-then-AGGREGATE Z-set
machinery as ``views.py::inverted_index_view`` / ``neardup_index.py``):
one signed ``(content_hash, doc_id)`` posting per live document, where
``content_hash = sha256`` over the token payload's canonical
little-endian int32 bytes. Updates retract the old hash through the
sign; deletes drop it. The index reflects the committed state exactly
at every epoch, at O(changed docs) per refresh, never rebuilt.

Two documents match iff their token sequences are IDENTICAL, and sha256
makes that decision exact at the postings row itself — unlike the
near-dup gate there is no candidate point-fetch/confirm step, so the
ingest screen is a pure postings lookup. Postings route by
``content_hash`` (uniform by construction), so a probe opens only the
partitions its hashes route to.

Relation to the batch ops: ``dedup_exact`` recomputes the corpus per
run (the one-shot sweep shape); this answers "is the new payload
already committed, and as which document" at O(incoming epoch).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..core.diff import SIGN_COLUMN
from .cdc import read_keys
from .views import ViewDef, lookup_terms

HASH_COLUMN = "content_hash"


def content_hashes(tokens) -> pa.Array:
    """sha256 hex per row over the canonical little-endian int32 bytes of
    a ``list<int32>`` column. Caller guarantees no null rows (filter on
    ``is_valid()`` first — the view transform and the gate both do).
    Values are sliced straight off the flat buffer with ABSOLUTE offsets
    (no per-row Python list materialization)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if len(tokens) == 0:
        return pa.array([], pa.string())
    offsets = np.asarray(tokens.offsets, dtype=np.int64)
    values = np.asarray(tokens.values, dtype=np.int32)
    out = [
        hashlib.sha256(values[offsets[i]: offsets[i + 1]].tobytes()).hexdigest()
        for i in range(len(tokens))
    ]
    return pa.array(out, pa.string())


def content_index_view(
    tokens_column: str = "tokens", key_column: str = "doc_id"
) -> ViewDef:
    """Content-hash postings as a transform view: one signed
    ``(content_hash, key)`` row per live document with a token payload.
    ``tokens_column`` is baked into ``transform_id`` (an index built
    over one payload column and probed with another must refuse, not
    silently miss — the ADVICE-r3 rule the near-dup index follows)."""

    def project(batch: pa.Table) -> pa.Table:
        toks = batch[tokens_column]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        # coalesce-mode partial images can null the payload: no posting
        batch = batch.filter(toks.is_valid())
        if batch.num_rows == 0:
            return pa.table(
                {HASH_COLUMN: pa.array([], pa.string()),
                 key_column: pa.array([], pa.string()),
                 SIGN_COLUMN: pa.array([], pa.int8())}
            )
        return pa.table(
            {HASH_COLUMN: content_hashes(batch[tokens_column]),
             key_column: batch[key_column],
             SIGN_COLUMN: batch[SIGN_COLUMN]}
        )

    return ViewDef(
        group_by=[HASH_COLUMN, key_column],
        # sha256 hex keys are uniform — route by hash alone so a probe
        # opens only the partitions its hashes route to
        route_by=[HASH_COLUMN],
        transform=project,
        transform_id=f"content-sha256-v1-{tokens_column}",
        source_columns=[key_column, tokens_column],
        derived_schema=pa.schema([(HASH_COLUMN, pa.string())]),
    )


def _empty_result() -> pa.Table:
    return pa.table(
        {"probe_id": pa.array([], pa.string()),
         "doc_id": pa.array([], pa.string())}
    )


def _check_sig(view_dir: str, table_dir: str | None, *, tokens_column: str,
               key_column: str, fs=None):
    """Signature + staleness guards shared by search and gate: a payload-
    column mismatch or a lagging index refuses loudly. Returns the view
    manifest, or None when there is no index state at all."""
    from ..state import manifest as mf

    cur_view = mf.load_current(view_dir, fs) if fs else mf.load_current(view_dir)
    if cur_view is None:
        return None
    expect_sig = content_index_view(
        tokens_column=tokens_column, key_column=key_column
    ).signature()
    got_sig = cur_view.epoch_counters.get("view_sig")
    if got_sig != expect_sig:
        raise ValueError(
            f"content index signature mismatch: view carries {got_sig!r}, "
            f"expected {expect_sig!r} — tokens/key columns must match the "
            "content_index_view the index was built with"
        )
    if table_dir is not None:
        cur_table = mf.load_current(table_dir, fs) if fs else mf.load_current(table_dir)
        if cur_table is not None and cur_table.epoch != cur_view.epoch:
            raise ValueError(
                f"content index is stale: view reflects epoch {cur_view.epoch}, "
                f"table committed epoch {cur_table.epoch} — refresh first"
            )
    return cur_view


def dup_search(
    view_dir: str,
    table_dir: str,
    doc_ids: list[str],
    tokens_column: str = "tokens",
    key_column: str = "doc_id",
) -> pa.Table:
    """Exact twins of the given committed documents against the committed
    corpus, via the maintained index: hash the probes' payloads →
    routed postings lookup → every posting under the same hash with a
    different key IS an exact duplicate (sha256 decides; no confirm
    fetch). Returns (probe_id, doc_id) sorted."""
    if _check_sig(view_dir, table_dir, tokens_column=tokens_column,
                  key_column=key_column) is None:
        return _empty_result()

    probes = read_keys(table_dir, sorted(set(doc_ids)),
                       columns=[key_column, tokens_column])
    if probes.num_rows:
        toks = probes[tokens_column]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        probes = probes.filter(toks.is_valid())
    if probes.num_rows == 0:
        return _empty_result()
    probe_ids = probes[key_column].to_pylist()
    hashes = content_hashes(probes[tokens_column]).to_pylist()
    postings = lookup_terms(view_dir, sorted(set(hashes)))
    if postings.num_rows == 0:
        return _empty_result()
    by_hash: dict[str, list[str]] = {}
    for h, k in zip(postings[HASH_COLUMN].to_pylist(),
                    postings[key_column].to_pylist()):
        by_hash.setdefault(h, []).append(k)
    out_p, out_d = [], []
    for pid, h in zip(probe_ids, hashes):
        for twin in sorted(d for d in by_hash.get(h, ()) if d != pid):
            out_p.append(pid)
            out_d.append(twin)
    order = sorted(range(len(out_p)), key=lambda i: (out_p[i], out_d[i]))
    return pa.table(
        {"probe_id": pa.array([out_p[i] for i in order], pa.string()),
         "doc_id": pa.array([out_d[i] for i in order], pa.string())}
    )
