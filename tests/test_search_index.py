"""Incrementally-maintained BM25 index over a CDC table
(engine/search_index.py): length/stats view exactness vs a serial
recompute, search equality vs a pure-python full-scan BM25 oracle over
the committed state, and the index tracking updates/deletes through
incremental refreshes without a rebuild."""

from __future__ import annotations

import math
import re

import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.search_index import (
    TOKEN_SPLIT,
    bm25_refresh,
    bm25_search,
    doc_length_view,
    tokenize_query,
)
from gamechanger_data_ray.engine.views import refresh, view_to_arrow

K1, B = 1.2, 0.75


def _events(rows):
    op, lsn, seq, doc, text = zip(*rows)
    return pa.table(
        {
            "op": pa.array(op, pa.string()),
            "lsn": pa.array(lsn, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(doc, pa.string()),
            "text": pa.array(text, pa.string()),
        }
    )


def _toks(text: str | None) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT, (text or "").lower()) if t]


def _oracle_bm25(tb: str, query: str, k: int) -> list[tuple[str, float]]:
    """Full-scan BM25 over the committed table, straight from the
    textbook formula — rounded to 6 dp, ties break on doc_id."""
    t = table_to_arrow(tb)
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    toks = {d: _toks(x) for d, x in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / max(1, n)
    terms = list(dict.fromkeys(_toks(query)))
    scored = []
    for d, ts in toks.items():
        s = 0.0
        for q in terms:
            tf = ts.count(q)
            if not tf:
                continue
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
        if round(s, 6) > 0:
            scored.append((d, round(s, 6)))
    scored.sort(key=lambda p: (-p[1], p[0]))
    return scored[:k]


CORPUS = [
    "merge batch table merge",
    "the quick brown fox jumps over the lazy dog",
    "batch processing of arrow tables in a merge pass",
    "tokenized training sequences packed into chunks",
    "table scans prune row groups by zone map",
    "",  # live doc with no tokens still counts toward N
    "merge merge merge merge merge",
    "a batch a table a merge a batch",
    "incremental view maintenance over signed deltas",
    "exactly once commit with epoch fencing",
]


def _bootstrap(tmp_path, rows=None):
    tb, idx = str(tmp_path / "tb"), str(tmp_path / "idx")
    rows = rows or [
        ("I", 1, i, f"d{i:03d}", txt) for i, txt in enumerate(CORPUS)
    ]
    e1 = _events(rows)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    assert set(bm25_refresh(idx, tb, num_partitions=4)) == {"inv", "len", "stats"}
    return tb, idx


def test_length_and_stats_views_exact_and_incremental(tmp_path):
    tb, idx = _bootstrap(tmp_path)
    lens = {
        r["doc_id"]: r["dl"] for r in view_to_arrow(f"{idx}/len").to_pylist()
    }
    assert lens == {f"d{i:03d}": len(_toks(t)) for i, t in enumerate(CORPUS)}
    stats = view_to_arrow(f"{idx}/stats").to_pylist()
    assert stats == [
        {"scope": "corpus", "n_rows": len(CORPUS),
         "sum_dl": sum(len(_toks(t)) for t in CORPUS)}
    ]

    # update shrinks one doc, delete removes another; views track exactly
    e2 = _events([("U", 2, 0, "d000", "merge"), ("D", 2, 1, "d006", None)])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    out = bm25_refresh(idx, tb)
    assert all(v == 2 for v in out.values())
    lens2 = {
        r["doc_id"]: r["dl"] for r in view_to_arrow(f"{idx}/len").to_pylist()
    }
    assert lens2["d000"] == 1 and "d006" not in lens2
    t = table_to_arrow(tb)
    want_n = t.num_rows
    want_sum = sum(len(_toks(x)) for x in t["text"].to_pylist())
    stats2 = view_to_arrow(f"{idx}/stats").to_pylist()
    assert stats2 == [{"scope": "corpus", "n_rows": want_n, "sum_dl": want_sum}]


@pytest.mark.parametrize("query", ["merge batch", "table", "Merge, TABLE! batch"])
def test_bm25_search_matches_full_scan_oracle(tmp_path, query):
    tb, idx = _bootstrap(tmp_path)
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_search(idx, tb, query, k=5).to_pylist()
    ]
    assert got == _oracle_bm25(tb, query, 5)


def test_bm25_search_tracks_updates_and_deletes(tmp_path):
    tb, idx = _bootstrap(tmp_path)
    top = bm25_search(idx, tb, "merge", k=1).to_pylist()
    assert top and top[0]["doc_id"] == "d006"  # the merge-spam doc

    e2 = _events([("D", 2, 0, "d006", None),
                  ("U", 2, 1, "d001", "merge conflicts everywhere")])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    bm25_refresh(idx, tb)
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_search(idx, tb, "merge", k=5).to_pylist()
    ]
    assert got == _oracle_bm25(tb, "merge", 5)
    assert all(d != "d006" for d, _ in got)


def test_bm25_guards(tmp_path):
    tb, idx = _bootstrap(tmp_path)
    # tokenizer/column mismatch → signature error
    with pytest.raises(ValueError, match="signature mismatch"):
        bm25_search(idx, tb, "merge", text_column="body")
    # commit another epoch without refreshing → stale
    e2 = _events([("I", 2, 0, "d999", "fresh merge content")])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    with pytest.raises(ValueError, match="stale"):
        bm25_search(idx, tb, "merge")
    # a partially-refreshed index (one subview behind) is also refused
    refresh(doc_length_view(), f"{idx}/len", tb)
    with pytest.raises(ValueError, match="stale"):
        bm25_search(idx, tb, "merge")
    bm25_refresh(idx, tb)
    got = bm25_search(idx, tb, "merge", k=3).to_pylist()
    assert [(r["doc_id"], r["score"]) for r in got] == _oracle_bm25(tb, "merge", 3)
    # no query terms → empty result, not an error — with the INDEX's key
    # type, so result schemas never flip between hit and miss queries
    empty = bm25_search(idx, tb, "!!!")
    assert empty.num_rows == 0
    assert empty.schema.field("doc_id").type == pa.string()
    # pointing the search at a table dir with no committed state is a
    # caller error (wrong path), not an empty corpus
    with pytest.raises(ValueError, match="no committed state"):
        bm25_search(idx, str(tmp_path / "nonexistent_tb"), "merge")


def test_bm25_cli_verbs(tmp_path, capsys):
    """bm25-view / bm25-search drive the index end-to-end from a
    bootstrap snapshot (in-process main(), Ray is the session fixture's)."""
    import json

    import pyarrow.parquet as pq

    from gamechanger_data_ray.__main__ import main

    snap = str(tmp_path / "snap.parquet")
    pq.write_table(
        pa.table({"doc_id": [f"d{i:03d}" for i in range(len(CORPUS))],
                  "text": CORPUS}),
        snap,
    )
    tb, idx = str(tmp_path / "tb"), str(tmp_path / "idx")
    assert main(["bootstrap", "--from", snap, "--table", tb]) == 0
    assert main(["bm25-view", "--table", tb, "--index", idx]) == 0
    capsys.readouterr()
    assert main(["bm25-search", "--table", tb, "--index", idx,
                 "--query", "merge batch", "--k", "3"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [(r["doc_id"], r["score"]) for r in out["results"]] == _oracle_bm25(
        tb, "merge batch", 3
    )


def test_tokenize_query_matches_index_tokenizer():
    assert tokenize_query("Merge, TABLE! batch-42 merge") == [
        "merge", "table", "batch", "42",
    ]
