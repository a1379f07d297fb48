"""Incrementally-maintained ANN index over a CDC table.

The reference rebuilds its search indexes from scratch per ingest (the
ES reindex-all path its inverted-index view analog replaces, see
``engine/views.py::inverted_index_view``). The same MAP-then-AGGREGATE
transform-view machinery maintains a SIMILARITY index at O(changed docs)
per refresh: each live document's embedding maps to its hyperplane-LSH
home bucket as a signed ``(bucket, doc_id)`` posting — updates retract
the old bucket through the Z-set sign, deletes drop the posting — so the
index is exact for the table's committed state at every epoch, never
stale and never rebuilt.

Query path (``ann_search``): code the query vectors with the SAME
deterministic hyperplanes, probe each query's home bucket plus all
hamming-1 neighbors (boundary-plane flips), fetch the candidate ids'
postings from only the routed view partitions (``lookup_terms``), then
point-look-up ONLY the candidate rows' embeddings from the table
(``read_keys`` reads just the partitions the keys hash to) and re-rank
exactly by cosine. No scan of the corpus at query time; no driver-side
index copy.

Scale notes: the view fold shuffles one 16-byte posting per changed doc;
``n_planes`` controls bucket occupancy (≈ N / 2^n_planes per bucket) —
raise it as the corpus grows. Recall follows the hamming-1 multiprobe
LSH of ``stages/similarity.py`` (tested ≥ brute-force floor there).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.diff import SIGN_COLUMN
from ..stages import similarity as sim
from .cdc import read_keys
from .views import ViewDef, lookup_terms


def ann_index_view(
    dim: int,
    vec_column: str = "embedding",
    key_column: str = "doc_id",
    n_planes: int = 8,
    seed: int = 7,
) -> ViewDef:
    """LSH-bucket postings as a transform view: one signed
    (bucket, key) row per live document. ``dim``/``n_planes``/``seed``
    are baked into ``transform_id`` so a view can never silently mix
    codes from different plane sets."""
    planes = sim.hyperplanes(dim, n_planes, seed)

    def fan(batch: pa.Table) -> pa.Table:
        m = sim.normalize_rows(sim._to_matrix(batch[vec_column]))
        codes = sim.lsh_code(m, planes).astype(np.int64)
        key = batch[key_column]
        sign = batch[SIGN_COLUMN]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        if isinstance(sign, pa.ChunkedArray):
            sign = sign.combine_chunks()
        return pa.table(
            {"bucket": pa.array(codes), key_column: key, SIGN_COLUMN: sign}
        )

    return ViewDef(
        group_by=["bucket", key_column],
        transform=fan,
        transform_id=f"ann-lsh-v1-d{dim}-p{n_planes}-s{seed}",
        source_columns=[key_column, vec_column],
        derived_schema=pa.schema([("bucket", pa.int64())]),
    )


def ann_search(
    view_dir: str,
    table_dir: str,
    queries: np.ndarray,
    k: int = 5,
    vec_column: str = "embedding",
    key_column: str = "doc_id",
    n_planes: int = 8,
    seed: int = 7,
) -> pa.Table:
    """Top-k cosine neighbors for each query row against the CURRENT
    committed table state, via the incrementally-maintained index.
    Returns (query_id, key, cosine, rank) sorted per query."""
    q = sim.normalize_rows(np.asarray(queries, dtype=np.float64))
    planes = sim.hyperplanes(q.shape[1], n_planes, seed)
    codes = sim.lsh_code(q, planes).astype(np.int64)
    # home bucket + hamming-1 probes per query
    probes = np.concatenate([codes] + [codes ^ (1 << b) for b in range(n_planes)])
    probe_sets = [
        {int(codes[i])} | {int(codes[i]) ^ (1 << b) for b in range(n_planes)}
        for i in range(len(q))
    ]
    postings = lookup_terms(view_dir, sorted({int(b) for b in probes}))
    out_q, out_key, out_cos, out_rank = [], [], [], []
    if postings.num_rows == 0:
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             key_column: pa.array(out_key),
             "cosine": pa.array(out_cos, pa.float64()),
             "rank": pa.array(out_rank, pa.int64())}
        )
    post_bucket = postings["bucket"].to_numpy(zero_copy_only=False)
    post_key = postings[key_column].to_pylist()
    # candidate ids per query + the union fetched ONCE via point lookup
    union_keys = sorted(set(post_key))
    rows = read_keys(table_dir, union_keys, columns=[key_column, vec_column])
    ids = rows[key_column].to_pylist()
    mat = sim.normalize_rows(sim._to_matrix(rows[vec_column]))
    pos = {key: i for i, key in enumerate(ids)}
    for qi in range(len(q)):
        cand = sorted(
            {key for b, key in zip(post_bucket, post_key) if int(b) in probe_sets[qi]}
        )
        cand = [c for c in cand if c in pos]  # key present in committed state
        if not cand:
            continue
        sub = mat[[pos[c] for c in cand]]
        cos = sub @ q[qi]
        order = sorted(range(len(cand)), key=lambda j: (-cos[j], cand[j]))[:k]
        for r, j in enumerate(order):
            out_q.append(qi)
            out_key.append(cand[j])
            out_cos.append(round(float(cos[j]), 5))
            out_rank.append(r + 1)
    return pa.table(
        {"query_id": pa.array(out_q, pa.int64()),
         key_column: pa.array(out_key),
         "cosine": pa.array(out_cos, pa.float64()),
         "rank": pa.array(out_rank, pa.int64())}
    )
