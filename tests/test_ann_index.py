"""Incrementally-maintained ANN index over a CDC table
(engine/ann_index.py): postings exactness vs a serial recompute, search
recall vs brute force over the committed state, and — the point — the
index tracking updates and deletes through incremental refreshes
without a rebuild."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from gamechanger_data_ray.engine.ann_index import ann_index_view, ann_search
from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.views import refresh, view_to_arrow
from gamechanger_data_ray.stages import similarity as sim

DIM, PLANES = 16, 6


def _vec(seed: int) -> list[float]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal(DIM).astype(np.float64).tolist()


def _events(rows):
    op, lsn, seq, doc, emb = zip(*rows)
    return pa.table(
        {
            "op": pa.array(op, pa.string()),
            "lsn": pa.array(lsn, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(doc, pa.string()),
            "embedding": pa.array(emb, pa.list_(pa.float64())),
        }
    )


def _oracle_postings(tb: str) -> set[tuple[int, str]]:
    t = table_to_arrow(tb)
    planes = sim.hyperplanes(DIM, PLANES, 7)
    m = sim.normalize_rows(sim._to_matrix(t["embedding"]))
    codes = sim.lsh_code(m, planes).astype(np.int64)
    return {(int(c), d) for c, d in zip(codes, t["doc_id"].to_pylist())}


def _brute_topk(tb: str, q: np.ndarray, k: int) -> list[str]:
    t = table_to_arrow(tb)
    m = sim.normalize_rows(sim._to_matrix(t["embedding"]))
    ids = t["doc_id"].to_pylist()
    cos = m @ (q / np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda j: (-cos[j], ids[j]))[:k]
    return [ids[j] for j in order]


def test_ann_index_postings_and_incremental_maintenance(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([("I", 1, i, f"d{i:03d}", _vec(i)) for i in range(40)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    view = ann_index_view(DIM, n_planes=PLANES)
    m = refresh(view, vd, tb, num_partitions=4)
    assert m is not None and m.epoch_counters["mode"] == "full"
    got = {
        (r["bucket"], r["doc_id"]) for r in view_to_arrow(vd).to_pylist()
    }
    assert got == _oracle_postings(tb)

    # update d005 to a new vector (old bucket retracts), delete d007
    e2 = _events([("U", 2, 0, "d005", _vec(999)), ("D", 2, 1, "d007", None)])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    m2 = refresh(view, vd, tb)
    assert m2 is not None and m2.epoch_counters["mode"] == "incremental"
    got2 = {
        (r["bucket"], r["doc_id"]) for r in view_to_arrow(vd).to_pylist()
    }
    assert got2 == _oracle_postings(tb)
    assert not any(d == "d007" for _, d in got2)  # deleted doc gone


def test_ann_search_finds_self_and_tracks_updates(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([("I", 1, i, f"d{i:03d}", _vec(i)) for i in range(60)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    view = ann_index_view(DIM, n_planes=PLANES)
    refresh(view, vd, tb, num_partitions=4)

    # query WITH a corpus vector: the exact copy must come back rank 1
    q = np.array([_vec(17)])
    res = ann_search(vd, tb, q, k=3, n_planes=PLANES).to_pylist()
    assert res and res[0]["doc_id"] == "d017" and res[0]["cosine"] == 1.0

    # overall recall vs brute force over several queries
    hits = total = 0
    queries = np.array([_vec(i) for i in (3, 11, 29, 44, 58)])
    res = ann_search(vd, tb, queries, k=3, n_planes=PLANES).to_pylist()
    by_q: dict[int, list[str]] = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    for qi, qvec in enumerate(queries):
        want = set(_brute_topk(tb, qvec, 3))
        got = set(by_q.get(qi, []))
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.4, f"recall too low: {hits}/{total}"

    # delete the best match and refresh: it must vanish from results
    e2 = _events([("D", 2, 0, "d017", None)])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    refresh(view, vd, tb)
    res2 = ann_search(vd, tb, q, k=3, n_planes=PLANES).to_pylist()
    assert all(r["doc_id"] != "d017" for r in res2)


def test_ann_cli_verbs(tmp_path):
    """The ann-view / ann-search CLI verbs drive the index end-to-end
    from a bootstrap snapshot (in-process main(), like the other CLI
    tests — Ray is the session fixture's)."""
    import json

    import pyarrow.parquet as pq

    from gamechanger_data_ray.__main__ import main

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((20, DIM))
    snap = str(tmp_path / "snap.parquet")
    pq.write_table(
        pa.table({"doc_id": [f"d{i:03d}" for i in range(20)],
                  "embedding": pa.array(emb.tolist(), pa.list_(pa.float64()))}),
        snap,
    )
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    assert main(["bootstrap", "--from", snap, "--table", tb]) == 0
    assert main(["ann-view", "--table", tb, "--view", vd,
                 "--dim", str(DIM), "--planes", str(PLANES)]) == 0
    q = ",".join(str(x) for x in emb[7])
    # --query=VALUE form: a leading '-0.1…' would otherwise parse as a flag
    assert main(["ann-search", "--table", tb, "--view", vd,
                 "--planes", str(PLANES), "--k", "2", f"--query={q}"]) == 0


def test_ann_search_guards_and_null_embeddings(tmp_path):
    """Review regressions: (1) a plane-set mismatch raises instead of
    silently collapsing recall; (2) a stale view (table committed past
    the refresh) raises instead of omitting changed docs; (3) a null
    embedding gets no posting and never corrupts its batch's codes."""
    import pytest as _pt

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    rows = [("I", 1, i, f"d{i:03d}", _vec(i)) for i in range(10)]
    rows.append(("I", 1, 10, "d-null", None))  # doc with no embedding
    e1 = _events(rows)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    view = ann_index_view(DIM, n_planes=PLANES)
    refresh(view, vd, tb, num_partitions=4)
    postings = view_to_arrow(vd)
    assert "d-null" not in set(postings["doc_id"].to_pylist())
    assert {
        (r["bucket"], r["doc_id"]) for r in postings.to_pylist()
    } == _oracle_postings_excluding_null(tb)

    q = np.array([_vec(3)])
    # wrong plane count → signature mismatch
    with _pt.raises(ValueError, match="signature mismatch"):
        ann_search(vd, tb, q, n_planes=PLANES + 2)
    # commit another epoch without refreshing → stale
    e2 = _events([("I", 2, 0, "d999", _vec(999))])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    with _pt.raises(ValueError, match="stale"):
        ann_search(vd, tb, q, n_planes=PLANES)
    refresh(view, vd, tb)
    res = ann_search(vd, tb, q, k=1, n_planes=PLANES).to_pylist()
    assert res and res[0]["doc_id"] == "d003"


def _oracle_postings_excluding_null(tb: str) -> set[tuple[int, str]]:
    t = table_to_arrow(tb)
    t = t.filter(t["embedding"].combine_chunks().is_valid())
    planes = sim.hyperplanes(DIM, PLANES, 7)
    m = sim.normalize_rows(sim._to_matrix(t["embedding"]))
    codes = sim.lsh_code(m, planes).astype(np.int64)
    return {(int(c), d) for c, d in zip(codes, t["doc_id"].to_pylist())}
