"""Incrementally-maintained typed graph-edge table over a CDC table —
the engine-layer K11 face.

``pipelines/extraction_queries.py::docs_graph_edges`` computes typed
edges as a batch sweep; the reference instead PUBLISHES incrementally
(``gc_neo4j_publisher/neo4j_publisher.py:122-172`` re-publishes each
changed document's MENTIONS/REFERENCES edges into Neo4j). This module
is that incremental contract on the Z-set view machinery
(``views.py::ViewDef`` MAP-then-AGGREGATE): each live document derives
its signed edge rows — updates retract the old edges through the sign,
deletes drop them — so the edge table reflects the table's committed
state exactly at every epoch, at O(changed docs) per refresh, never
republished wholesale and never stale.

Edge legs over the tokens-table schema (doc_id, tokens, source):

- ``MENTIONS``: one edge per (doc, gazetteer token) with multiplicity
  ``n_rows`` — the Document-MENTIONS-Entity leg, the gazetteer being a
  broadcast vocabulary of entity token ids (the ``entities.py:18-25``
  lookup-trie analog in token space);
- ``FROM_SOURCE``: one provenance edge per doc to its source — the
  crawler-origin edge the reference stores as node properties.

Grouping is ``(src, rel, dst)`` with ``src`` leading, so the view's
sorted partition files prune point lookups by document key
(``views.py::lookup_terms`` row-group predicate), and ``edges_of`` is a
postings read, never a scan. The gazetteer's content hash is baked into
``transform_id``: an index built over one vocabulary and queried after
a vocabulary change refuses with a signature mismatch instead of
silently serving half-updated edges.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.diff import SIGN_COLUMN
from .views import ViewDef, lookup_terms


def _gaz_signature(gazetteer: list[int]) -> str:
    return hashlib.sha256(
        ",".join(str(int(g)) for g in sorted(set(gazetteer))).encode()
    ).hexdigest()[:12]


def typed_edge_view(
    gazetteer: list[int],
    tokens_column: str = "tokens",
    key_column: str = "doc_id",
    source_column: str = "source",
) -> ViewDef:
    """Signed (src, rel, dst) edge rows per live document; ``n_rows``
    after the fold is the edge multiplicity (mention count; 1 for
    provenance edges)."""
    gaz = np.array(sorted(set(int(g) for g in gazetteer)), dtype=np.int64)
    gaz_sig = _gaz_signature(gazetteer)

    def fan(batch: pa.Table) -> pa.Table:
        key = batch[key_column]
        sign = batch[SIGN_COLUMN]
        toks = batch[tokens_column]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        if isinstance(sign, pa.ChunkedArray):
            sign = sign.combine_chunks()
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()

        srcs: list[pa.Array] = []
        rels: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        signs: list[pa.Array] = []

        # MENTIONS: flatten token lists, membership-mask against the
        # gazetteer, repeat doc/sign by per-row kept counts — one numpy
        # pass, no Python per row. Null token lists derive no edges.
        lens = pc.coalesce(pc.list_value_length(toks), pa.scalar(0)).to_numpy(
            zero_copy_only=False
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(len(batch)), lens)
        keep = np.isin(flat, gaz)
        if keep.any():
            rows = row_of[keep]
            srcs.append(key.take(pa.array(rows)))
            rels.append(np.full(len(rows), "MENTIONS", dtype=object))
            dsts.append(np.char.add("tok:", flat[keep].astype(str)).astype(object))
            signs.append(sign.take(pa.array(rows)))

        # FROM_SOURCE: one edge per row with a non-null source
        if source_column in batch.schema.names:
            src_col = batch[source_column]
            if isinstance(src_col, pa.ChunkedArray):
                src_col = src_col.combine_chunks()
            valid = src_col.is_valid()
            rows = np.flatnonzero(valid.to_numpy(zero_copy_only=False))
            if len(rows):
                srcs.append(key.take(pa.array(rows)))
                rels.append(np.full(len(rows), "FROM_SOURCE", dtype=object))
                dsts.append(
                    np.char.add(
                        "src:",
                        np.asarray(src_col.take(pa.array(rows)).to_pylist(), dtype=object).astype(str),
                    ).astype(object)
                )
                signs.append(sign.take(pa.array(rows)))

        if not srcs:
            return pa.table(
                {"src": pa.array([], pa.string()),
                 "rel": pa.array([], pa.string()),
                 "dst": pa.array([], pa.string()),
                 SIGN_COLUMN: pa.array([], pa.int8())}
            )
        return pa.table(
            {"src": pc.cast(pa.concat_arrays([pc.cast(s, pa.string()) for s in srcs]), pa.string()),
             "rel": pa.array(np.concatenate(rels), pa.string()),
             "dst": pa.array(np.concatenate(dsts), pa.string()),
             SIGN_COLUMN: pa.concat_arrays([s for s in signs])}
        )

    return ViewDef(
        group_by=["src", "rel", "dst"],
        # route by src alone: edges_of(doc_ids) then opens only the
        # partitions the probed docs hash to. Doc ids are uniform and a
        # doc's edge count is bounded, so no skew risk (contrast BM25
        # terms, which stay composed-key routed).
        route_by=["src"],
        transform=fan,
        transform_id=(f"typed-edges-v1-{tokens_column}-{source_column}"
                      f"-g{gaz_sig}"),
        source_columns=[key_column, tokens_column, source_column],
        derived_schema=pa.schema(
            [("src", pa.string()), ("rel", pa.string()), ("dst", pa.string())]
        ),
    )


def edges_of(view_dir: str, doc_ids: list[str]) -> pa.Table:
    """Committed edges of the given documents via the maintained view:
    (src, rel, dst, n_rows) — a pruned postings read on the src-leading
    sort order, never a scan."""
    return lookup_terms(view_dir, sorted(set(doc_ids)))
