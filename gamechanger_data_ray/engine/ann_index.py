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
deterministic hyperplanes (the view's stored signature is CHECKED, so a
plane-set mismatch errors instead of silently collapsing recall), probe
each query's home bucket plus all hamming-1 neighbors
(``sim.probe_codes``), read the probed buckets' postings via
``lookup_terms`` (the two-column group key means every view partition's
FOOTER is opened, but the ``bucket IN (...)`` predicate prunes at
row-group granularity — postings files are written bucket-sorted), then
point-look-up ONLY the candidate rows' embeddings from the table
(``read_keys`` reads just the partitions the keys hash to) and re-rank
exactly by cosine. The corpus itself is never scanned at query time; a
stale view (table committed past the last refresh, or rolled back under
it) raises instead of silently omitting changed docs.

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
        # a doc without an embedding has no posting (coalesce-mode partial
        # images can null the vector); _to_matrix would silently misalign
        # the flattened values otherwise
        valid = batch[vec_column]
        if isinstance(valid, pa.ChunkedArray):
            valid = valid.combine_chunks()
        batch = batch.filter(valid.is_valid())
        if batch.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 key_column: pa.array([], pa.string()),
                 SIGN_COLUMN: pa.array([], pa.int8())}
            )
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


def _empty_result() -> pa.Table:
    return pa.table(
        {"query_id": pa.array([], pa.int64()),
         "doc_id": pa.array([], pa.string()),
         "cosine": pa.array([], pa.float64()),
         "rank": pa.array([], pa.int64())}
    )


def ann_search(
    view_dir: str,
    table_dir: str,
    queries: np.ndarray,
    k: int = 5,
    vec_column: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
) -> pa.Table:
    """Top-k cosine neighbors for each query row against the committed
    table state, via the maintained index. Returns
    (query_id, doc_id, cosine, rank) sorted per query. The key is always
    ``doc_id`` — the CDC sink names every table's key doc_id (bootstrap
    renames), and ``read_keys`` routes on it. Raises on a plane-set
    signature mismatch or a view that doesn't reflect the table's
    committed epoch (refresh first) — both would otherwise return
    silently wrong results."""
    q = sim.normalize_rows(np.asarray(queries, dtype=np.float64))
    dim = q.shape[1]

    from ..state import manifest as mf

    cur_view = mf.load_current(view_dir)
    if cur_view is None:
        return _empty_result()
    expect_sig = ann_index_view(dim, vec_column=vec_column,
                                n_planes=n_planes, seed=seed).signature()
    got_sig = cur_view.epoch_counters.get("view_sig")
    if got_sig != expect_sig:
        raise ValueError(
            f"ANN index signature mismatch: view carries {got_sig!r}, search "
            f"params expect {expect_sig!r} — dim/n_planes/seed must match the "
            "ann_index_view the index was built with"
        )
    cur_table = mf.load_current(table_dir)
    if cur_table is not None and cur_table.epoch != cur_view.epoch:
        raise ValueError(
            f"ANN index is stale: view reflects epoch {cur_view.epoch}, table "
            f"committed epoch {cur_table.epoch} — refresh the view first"
        )

    planes = sim.hyperplanes(dim, n_planes, seed)
    codes = sim.lsh_code(q, planes).astype(np.int64)
    probe_sets = [set(sim.probe_codes(int(c), n_planes)) for c in codes]
    all_probes = sorted(set().union(*probe_sets)) if probe_sets else []
    postings = lookup_terms(view_dir, all_probes)
    if postings.num_rows == 0:
        return _empty_result()
    post_bucket = postings["bucket"].to_numpy(zero_copy_only=False)
    post_key = postings["doc_id"].to_pylist()
    # candidate ids per query + the union fetched ONCE via point lookup
    union_keys = sorted(set(post_key))
    rows = read_keys(table_dir, union_keys, columns=["doc_id", vec_column])
    if rows.num_rows:
        valid = rows[vec_column]
        if isinstance(valid, pa.ChunkedArray):
            valid = valid.combine_chunks()
        rows = rows.filter(valid.is_valid())
    if rows.num_rows == 0:
        return _empty_result()
    ids = rows["doc_id"].to_pylist()
    mat = sim.normalize_rows(sim._to_matrix(rows[vec_column]))
    pos = {key: i for i, key in enumerate(ids)}
    out_q, out_key, out_cos, out_rank = [], [], [], []
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
         "doc_id": pa.array(out_key, pa.string()),
         "cosine": pa.array(out_cos, pa.float64()),
         "rank": pa.array(out_rank, pa.int64())}
    )
