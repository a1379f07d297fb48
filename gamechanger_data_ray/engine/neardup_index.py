"""Incrementally-maintained MinHash-LSH near-duplicate index over a CDC
table of tokenized documents.

Batch near-dup detection (``pipelines/analysis_queries.py::dedup_minhash_lsh``
and friends) recomputes the whole corpus per run — the right shape for a
one-shot sweep, the wrong one for a live lake where each epoch touches a
tiny fraction of 10^10 documents. This module maintains the LSH banding
as a transform view (the same MAP-then-AGGREGATE Z-set machinery as
``views.py::inverted_index_view`` / ``ann_index.py``): each live
document's token-shingle MinHash signature maps to ``NUM_BANDS`` signed
``(bucket, doc_id)`` posting rows — updates retract the old bands
through the sign, deletes drop them — so the index reflects the table's
committed state exactly at every epoch, at O(changed docs) per refresh,
never rebuilt and never stale.

Query path (``neardup_search``): hash the probe documents with the SAME
baked hasher (the view signature is checked, so a k/seed/band mismatch
errors instead of silently collapsing recall), look up ONLY the probes'
band buckets (``lookup_terms`` — row-group-pruned postings reads),
point-fetch the candidate documents' tokens via ``read_keys`` (only the
partitions the keys hash to), and confirm with EXACT token-shingle
Jaccard. The corpus is never scanned at query time; candidates per
probe are LSH-bounded and additionally capped (``max_candidates``) so a
boilerplate-flooded bucket degrades to "flagged, truncated" instead of
a quadratic verify (same guard philosophy as ``stages/dedup.py``'s
``max_bucket``).

Scale notes: the view fold shuffles NUM_BANDS (=16) skinny posting rows
per changed doc — tokens never ride the view shuffle. Band count/width
set the Jaccard knee (16×4 → τ ≈ 0.5); they are baked into the view
signature, so retuning builds a fresh index dir rather than mixing
incompatible bucketings.

Reference parity: gamechanger-data dedups at ingest via content hashes
only (``common/utils/text_utils.py`` checksum paths); near-dup at this
granularity is part of this repo's LLM-training-data extension surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.diff import SIGN_COLUMN
from ..stages.dedup import (
    NUM_BANDS,
    NUM_HASHES,
    TokenMinHasher,
    lsh_bands,
    token_shingle_jaccard,
)
from .cdc import read_keys
from .views import ViewDef, lookup_terms

_BAND_MIX = np.uint64(0x9E3779B97F4A7C15)


def _band_buckets(hasher: TokenMinHasher, token_lists) -> np.ndarray:
    """(N, NUM_BANDS) int64 bucket ids: MinHash → banded FNV fold →
    band index mixed in so band j of one doc can only collide with band
    j of another (the standard LSH banding contract)."""
    sigs = hasher.signatures_from_lists(token_lists).astype(np.int64)
    n = len(sigs)
    if n == 0:
        return np.empty((0, NUM_BANDS), dtype=np.int64)
    base = lsh_bands(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "sig": list(sigs)})
    )
    h = base["band_hash"].to_numpy().reshape(n, NUM_BANDS).astype(np.uint64)
    band = np.arange(1, NUM_BANDS + 1, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        mixed = (h ^ (band * _BAND_MIX)) * np.uint64(0xBF58476D1CE4E5B9)
    return mixed.view(np.int64)


def neardup_index_view(
    tokens_column: str = "tokens",
    key_column: str = "doc_id",
    k: int = 5,
    seed: int = 1234,
) -> ViewDef:
    """LSH band postings as a transform view: NUM_BANDS signed
    (bucket, key) rows per live document. ``k``/``seed`` and the band
    geometry are baked into ``transform_id`` so a view can never
    silently mix incompatible bucketings."""
    hasher = TokenMinHasher(id_col=key_column, tokens_col=tokens_column,
                            k=k, seed=seed)

    def fan(batch: pa.Table) -> pa.Table:
        # a doc without tokens has no postings (coalesce-mode partial
        # images can null the payload); signatures_from_lists would
        # misalign the flattened values otherwise
        valid = batch[tokens_column]
        if isinstance(valid, pa.ChunkedArray):
            valid = valid.combine_chunks()
        batch = batch.filter(valid.is_valid())
        if batch.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 key_column: pa.array([], pa.string()),
                 SIGN_COLUMN: pa.array([], pa.int8())}
            )
        buckets = _band_buckets(hasher, batch[tokens_column])
        key = batch[key_column]
        sign = batch[SIGN_COLUMN]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        if isinstance(sign, pa.ChunkedArray):
            sign = sign.combine_chunks()
        n = batch.num_rows
        return pa.table(
            {"bucket": pa.array(buckets.reshape(-1)),
             key_column: key.take(pa.array(np.repeat(np.arange(n), NUM_BANDS))),
             SIGN_COLUMN: sign.take(pa.array(np.repeat(np.arange(n), NUM_BANDS)))}
        )

    return ViewDef(
        group_by=["bucket", key_column],
        # route by bucket alone: minhash band buckets are mixed 64-bit
        # hashes (uniform — no skew risk, unlike Zipf BM25 terms or
        # clustered sign-LSH codes), so probe lookups open only the
        # partitions the probed buckets hash to instead of every
        # partition. Signature-bearing: an index built composed-key
        # refuses rather than silently missing postings.
        route_by=["bucket"],
        transform=fan,
        # tokens_column is part of the identity: an index built over one
        # tokens column and searched with another must fail the signature
        # check, not silently collapse recall (ADVICE r3)
        transform_id=(f"neardup-minhash-v1-{tokens_column}-k{k}-s{seed}"
                      f"-h{NUM_HASHES}-b{NUM_BANDS}"),
        source_columns=[key_column, tokens_column],
        derived_schema=pa.schema([("bucket", pa.int64())]),
    )


def _empty_result() -> pa.Table:
    return pa.table(
        {"probe_id": pa.array([], pa.string()),
         "doc_id": pa.array([], pa.string()),
         "jaccard": pa.array([], pa.float64()),
         "truncated": pa.array([], pa.bool_())}
    )


def neardup_search(
    view_dir: str,
    table_dir: str,
    doc_ids: list[str],
    threshold: float = 0.5,
    k: int = 5,
    seed: int = 1234,
    tokens_column: str = "tokens",
    key_column: str = "doc_id",
    max_candidates: int = 500,
) -> pa.Table:
    """Near-duplicates of the given committed documents against the
    committed corpus, via the maintained index: band-bucket probe →
    postings lookup → point-fetch candidates → EXACT token-shingle
    Jaccard ≥ ``threshold``. Returns (probe_id, doc_id, jaccard,
    truncated) sorted by (probe_id, -jaccard, doc_id); ``truncated``
    marks probes whose candidate set hit ``max_candidates`` (boilerplate
    flood — results are a lower bound there). Raises on a hasher
    signature mismatch or a view lagging/ahead of the table's committed
    epoch — both would otherwise return silently wrong results."""
    from ..state import manifest as mf

    cur_view = mf.load_current(view_dir)
    if cur_view is None:
        return _empty_result()
    expect_sig = neardup_index_view(tokens_column=tokens_column,
                                    key_column=key_column, k=k,
                                    seed=seed).signature()
    got_sig = cur_view.epoch_counters.get("view_sig")
    if got_sig != expect_sig:
        raise ValueError(
            f"near-dup index signature mismatch: view carries {got_sig!r}, "
            f"search params expect {expect_sig!r} — k/seed must match the "
            "neardup_index_view the index was built with"
        )
    cur_table = mf.load_current(table_dir)
    if cur_table is not None and cur_table.epoch != cur_view.epoch:
        raise ValueError(
            f"near-dup index is stale: view reflects epoch {cur_view.epoch}, "
            f"table committed epoch {cur_table.epoch} — refresh the view first"
        )

    probes = read_keys(table_dir, sorted(set(doc_ids)),
                       columns=[key_column, tokens_column])
    if probes.num_rows:
        valid = probes[tokens_column]
        if isinstance(valid, pa.ChunkedArray):
            valid = valid.combine_chunks()
        probes = probes.filter(valid.is_valid())
    if probes.num_rows == 0:
        return _empty_result()

    hasher = TokenMinHasher(id_col=key_column, tokens_col=tokens_column,
                            k=k, seed=seed)
    probe_ids = probes[key_column].to_pylist()
    probe_tokens = probes[tokens_column].to_pylist()
    buckets = _band_buckets(hasher, probes[tokens_column])  # (Q, NUM_BANDS)
    probe_sets = [set(int(b) for b in row) for row in buckets]
    all_probes = sorted(set().union(*probe_sets)) if probe_sets else []
    postings = lookup_terms(view_dir, all_probes)
    if postings.num_rows == 0:
        return _empty_result()
    post_bucket = postings["bucket"].to_numpy(zero_copy_only=False)
    post_key = postings[key_column].to_pylist()

    # candidate ids per probe; the union fetched ONCE via point lookup
    cands: list[list[str]] = []
    trunc: list[bool] = []
    for qi, pid in enumerate(probe_ids):
        c = sorted({key for b, key in zip(post_bucket, post_key)
                    if int(b) in probe_sets[qi] and key != pid})
        trunc.append(len(c) > max_candidates)
        cands.append(c[:max_candidates])
    union_keys = sorted(set().union(*[set(c) for c in cands]))
    if not union_keys:
        return _empty_result()
    rows = read_keys(table_dir, union_keys, columns=[key_column, tokens_column])
    tok_of = dict(zip(rows[key_column].to_pylist(),
                      rows[tokens_column].to_pylist()))

    out_p, out_d, out_j, out_t = [], [], [], []
    for qi, pid in enumerate(probe_ids):
        scored = []
        for c in cands[qi]:
            ct = tok_of.get(c)
            if ct is None:
                continue
            j = token_shingle_jaccard(probe_tokens[qi], ct, k=k)
            if j >= threshold:
                scored.append((round(float(j), 5), c))
        for j, c in sorted(scored, key=lambda t: (-t[0], t[1])):
            out_p.append(pid)
            out_d.append(c)
            out_j.append(j)
            out_t.append(trunc[qi])
    return pa.table(
        {"probe_id": pa.array(out_p, pa.string()),
         "doc_id": pa.array(out_d, pa.string()),
         "jaccard": pa.array(out_j, pa.float64()),
         "truncated": pa.array(out_t, pa.bool_())}
    )
