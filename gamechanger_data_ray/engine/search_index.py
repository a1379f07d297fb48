"""Incrementally-maintained BM25 text index over a CDC table.

The reference's core sink is an Elasticsearch bulk indexer and its core
read path is term search against that index
(`gc_elasticsearch_publisher.py:79-129` builds it; search is served by
the ES cluster). ``engine/views.py::inverted_index_view`` already
maintains the postings half at O(changed docs) per refresh; this module
adds the other half ES keeps per shard — document lengths and corpus
statistics — as two more transform views over the SAME Z-set machinery,
plus the query-time scorer (``bm25_search``) that turns postings +
lengths + stats into exact BM25 top-k over the table's committed state.

A BM25 index is three views sharing one index dir:

    idx/inv    (term, doc_id)  n_rows = term frequency     O(terms×docs)
    idx/len    (doc_id)        dl = live token count       O(docs)
    idx/stats  ("corpus")      n_rows = N, sum_dl          ONE row

All three refresh from the table's retraction diff — an update retracts
the old document's terms/length through the sign column and adds the
new ones, a delete drops them — so the index is exact for the committed
epoch, never stale and never rebuilt (vs the reference's reindex-all).

Query path (``bm25_search``): tokenize the query with the SAME
tokenizer the views baked in (signatures are CHECKED, so a tokenizer or
column mismatch errors instead of silently scoring wrong), read the
query terms' postings via ``lookup_terms`` (row-group-pruned), read the
one stats row, point-look-up ONLY the candidate docs' lengths from the
length view (single-column group key → partition-pruned), then score
vectorized. The corpus is never scanned at query time; candidate count
is bounded by the query terms' postings, exactly like ES.

Scale notes: the inverted fold shuffles one small posting per changed
(term, doc) — the dominant cost, same as any Lucene indexing pass; the
length view adds one row per changed doc; the stats view adds one
partial row per BLOCK (its single group is not a hot key: partials are
pre-combined per block before the one-partition exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.diff import SIGN_COLUMN
from ..state import manifest as mf
from ..state.fs import StorageAdapter, default_fs
from .views import (
    TOKEN_SPLIT,
    ViewDef,
    inverted_index_view,
    lookup_terms,
    refresh,
    view_to_arrow,
)

BM25_K1 = 1.2
BM25_B = 0.75

INV_SUBDIR, LEN_SUBDIR, STATS_SUBDIR = "inv", "len", "stats"


def _token_counts(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Non-empty lowercase [a-z0-9]+ token count per row — the same
    tokens inverted_index_view explodes, so SUM(tf) over a doc's
    postings == its dl here."""
    text = pc.coalesce(pc.cast(text, pa.string()), pa.scalar(""))
    toks = pc.split_pattern_regex(pc.utf8_lower(text), TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    n = len(lens)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    flat_nonempty = pc.not_equal(pc.list_flatten(toks), pa.scalar("")).to_numpy(
        zero_copy_only=False
    )
    idx = np.repeat(np.arange(n), lens)
    return np.bincount(idx[flat_nonempty], minlength=n).astype(np.int64)


def doc_length_view(
    text_column: str = "text", key_column: str = "doc_id"
) -> ViewDef:
    """Per-document live token count as a transform view: one
    (doc_id, dl) row per live doc; updates replace dl through the signed
    retract+add, deletes drop the row (n_rows reaches 0)."""

    def lengths(batch: pa.Table) -> pa.Table:
        key = batch[key_column]
        sign = batch[SIGN_COLUMN]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        if isinstance(sign, pa.ChunkedArray):
            sign = sign.combine_chunks()
        return pa.table(
            {
                key_column: key,
                "dl": pa.array(_token_counts(batch[text_column])),
                SIGN_COLUMN: sign,
            }
        )

    return ViewDef(
        group_by=[key_column],
        sums={"dl": "dl"},
        transform=lengths,
        transform_id=f"bm25-doclen-v1-{text_column}",
        source_columns=[key_column, text_column],
        derived_schema=pa.schema([("dl", pa.int64())]),
    )


def corpus_stats_view(text_column: str = "text") -> ViewDef:
    """Corpus-wide N (live docs) and total token count as a ONE-row
    maintained view (group key is the constant "corpus"): n_rows = N,
    sum_dl = Σ dl. avgdl derives at read time."""

    def stats(batch: pa.Table) -> pa.Table:
        sign = batch[SIGN_COLUMN]
        if isinstance(sign, pa.ChunkedArray):
            sign = sign.combine_chunks()
        return pa.table(
            {
                "scope": pa.array(["corpus"] * batch.num_rows, pa.string()),
                "dl": pa.array(_token_counts(batch[text_column])),
                SIGN_COLUMN: sign,
            }
        )

    return ViewDef(
        group_by=["scope"],
        sums={"sum_dl": "dl"},
        transform=stats,
        transform_id=f"bm25-stats-v1-{text_column}",
        source_columns=[text_column],
        derived_schema=pa.schema([("scope", pa.string()), ("dl", pa.int64())]),
    )


def bm25_views(
    text_column: str = "text", key_column: str = "doc_id"
) -> dict[str, ViewDef]:
    return {
        INV_SUBDIR: inverted_index_view(text_column, key_column),
        LEN_SUBDIR: doc_length_view(text_column, key_column),
        STATS_SUBDIR: corpus_stats_view(text_column),
    }


def bm25_refresh(
    index_dir: str,
    table_dir: str,
    text_column: str = "text",
    key_column: str = "doc_id",
    num_partitions: int = 8,
    fs: StorageAdapter | None = None,
) -> dict[str, int | None]:
    """Bring all three index views to the table's committed epoch.
    Returns {subview: committed epoch or None if already current}.
    Each subview refreshes independently through the same diff, so a
    partially-failed refresh is safe: rerun converges (epoch fencing),
    and ``bm25_search`` refuses to score until all three agree."""
    fs = default_fs(fs)
    out: dict[str, int | None] = {}
    for sub, view in bm25_views(text_column, key_column).items():
        parts = 1 if sub == STATS_SUBDIR else num_partitions
        m = refresh(view, f"{index_dir}/{sub}", table_dir,
                    num_partitions=parts, fs=fs)
        out[sub] = m.epoch if m is not None else None
    return out


def tokenize_query(query: str) -> list[str]:
    """The index's tokenizer applied to a query string: lowercase
    [a-z0-9]+ runs, deduplicated, order-preserving."""
    import re

    return list(dict.fromkeys(
        t for t in re.split(TOKEN_SPLIT, query.lower()) if t
    ))


def _empty_result(key_type: pa.DataType | None = None) -> pa.Table:
    return pa.table(
        {"doc_id": pa.array([], key_type or pa.string()),
         "score": pa.array([], pa.float64()),
         "rank": pa.array([], pa.int64())}
    )


def bm25_search(
    index_dir: str,
    table_dir: str,
    query: str | list[str],
    k: int = 10,
    text_column: str = "text",
    key_column: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    fs: StorageAdapter | None = None,
) -> pa.Table:
    """Exact BM25 top-k over the committed table state via the
    maintained index. Returns (doc_id, score, rank) with scores rounded
    to 6 dp before ordering (ties break on doc_id) — the same contract
    as the full-scan ``pipelines/search.py::docs_bm25``.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the non-negative
    Robertson–Sparck Jones variant Lucene uses. Raises on a view
    signature mismatch (different tokenizer/column than the search
    params expect) or on any subview not reflecting the table's
    committed epoch (refresh first) — both would otherwise return
    silently wrong rankings."""
    fs = default_fs(fs)
    terms = tokenize_query(query) if isinstance(query, str) else [
        t for q in query for t in tokenize_query(q)
    ]
    terms = list(dict.fromkeys(terms))

    views = bm25_views(text_column, key_column)
    manifests: dict[str, mf.TableManifest] = {}
    for sub, view in views.items():
        cur = mf.load_current(f"{index_dir}/{sub}", fs)
        if cur is None:
            return _empty_result()
        got = cur.epoch_counters.get("view_sig")
        if got != view.signature():
            raise ValueError(
                f"BM25 index signature mismatch on {sub!r}: view carries "
                f"{got!r}, search params expect {view.signature()!r} — "
                "text/key column must match the views the index was built with"
            )
        manifests[sub] = cur
    key_type = manifests[LEN_SUBDIR].schema.field(key_column).type
    epochs = {sub: m.epoch for sub, m in manifests.items()}
    cur_table = mf.load_current(table_dir, fs)
    if cur_table is None:
        # an index with no table underneath is a caller error (wrong
        # table_dir), not an empty result — scoring would be for a table
        # that doesn't exist at the given path
        raise ValueError(
            f"BM25 index at {index_dir!r} exists but {table_dir!r} has no "
            "committed state — table_dir must be the table the index was "
            "built over"
        )
    if len(set(epochs.values())) != 1 or epochs[INV_SUBDIR] != cur_table.epoch:
        raise ValueError(
            f"BM25 index is stale: subview epochs {epochs}, table committed "
            f"epoch {cur_table.epoch} — bm25_refresh first"
        )
    if not terms:
        return _empty_result(key_type)

    stats = view_to_arrow(f"{index_dir}/{STATS_SUBDIR}", fs)
    if stats.num_rows == 0:
        return _empty_result(key_type)
    n_docs = int(stats["n_rows"][0].as_py())
    sum_dl = int(stats["sum_dl"][0].as_py())
    if n_docs <= 0:
        return _empty_result(key_type)
    avgdl = sum_dl / n_docs

    postings = lookup_terms(f"{index_dir}/{INV_SUBDIR}", terms, fs)
    if postings.num_rows == 0:
        return _empty_result(key_type)
    post_term = postings["term"].to_numpy(zero_copy_only=False)
    post_doc = postings[key_column].to_numpy(zero_copy_only=False)
    post_tf = postings["n_rows"].to_numpy(zero_copy_only=False).astype(np.float64)

    # df per term: postings rows are distinct (term, doc) pairs
    uniq_terms, df_counts = np.unique(post_term, return_counts=True)
    idf = {
        t: float(np.log(1.0 + (n_docs - c + 0.5) / (c + 0.5)))
        for t, c in zip(uniq_terms, df_counts)
    }

    cand = sorted(set(post_doc.tolist()))
    lens = lookup_terms(f"{index_dir}/{LEN_SUBDIR}", cand, fs)
    dl_of = dict(
        zip(lens[key_column].to_pylist(),
            lens["dl"].to_numpy(zero_copy_only=False).tolist())
    )
    missing = [d for d in cand if d not in dl_of]
    if missing:
        # the views refresh from the same diff and the epochs were
        # checked above, so a posting without a length row means index
        # corruption — raise rather than score with a made-up length
        raise ValueError(
            f"BM25 index inconsistency: {len(missing)} candidate doc(s) have "
            f"postings but no length row (first: {missing[0]!r}) — rebuild "
            "the index into a fresh dir"
        )
    pos = {d: i for i, d in enumerate(cand)}
    dl = np.array([float(dl_of[d]) for d in cand])
    norm = k1 * (1.0 - b + b * dl / max(avgdl, 1e-12))
    total = np.zeros(len(cand), dtype=np.float64)
    rows = np.array([pos[d] for d in post_doc.tolist()], dtype=np.int64)
    contrib = (
        np.array([idf[t] for t in post_term.tolist()])
        * post_tf * (k1 + 1.0) / (post_tf + norm[rows])
    )
    np.add.at(total, rows, contrib)
    total = np.round(total, 6)

    keep = np.flatnonzero(total > 0)
    order = sorted(keep.tolist(), key=lambda j: (-total[j], cand[j]))[:k]
    return pa.table(
        {"doc_id": pa.array([cand[j] for j in order], key_type),
         "score": pa.array([float(total[j]) for j in order], pa.float64()),
         "rank": pa.array(list(range(1, len(order) + 1)), pa.int64())}
    )
