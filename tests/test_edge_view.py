"""Incrementally-maintained typed edge view (engine/edge_view.py):
edge-set exactness vs a serial recompute through insert/update/delete
epochs, point lookups via the pruned postings read, and the baked
gazetteer signature refusing a vocabulary mismatch."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.edge_view import edges_of, typed_edge_view
from gamechanger_data_ray.engine.views import refresh, view_to_arrow
from gamechanger_data_ray.state import manifest as mf

GAZ = [7, 11, 42]


def _events(rows):
    op, lsn, seq, doc, toks, src = zip(*rows)
    return pa.table(
        {"op": pa.array(op, pa.string()),
         "lsn": pa.array(lsn, pa.int64()),
         "seq": pa.array(seq, pa.int64()),
         "doc_id": pa.array(doc, pa.string()),
         "tokens": pa.array(
             [list(t) if t is not None else None for t in toks],
             pa.list_(pa.int32())),
         "source": pa.array(src, pa.string())}
    )


def _oracle_edges(tb: str) -> dict[tuple[str, str, str], int]:
    """Serial recompute of the expected edge multiset from the committed
    table state."""
    t = table_to_arrow(tb)
    out: dict[tuple[str, str, str], int] = {}
    for row in t.to_pylist():
        did, toks, src = row["doc_id"], row["tokens"], row.get("source")
        for tok in toks or []:
            if tok in GAZ:
                k = (did, "MENTIONS", f"tok:{tok}")
                out[k] = out.get(k, 0) + 1
        if src is not None:
            out[(did, "FROM_SOURCE", f"src:{src}")] = 1
    return out


def _view_edges(vd: str) -> dict[tuple[str, str, str], int]:
    t = view_to_arrow(vd)
    if t.num_rows == 0:
        return {}
    return {
        (r["src"], r["rel"], r["dst"]): r["n_rows"] for r in t.to_pylist()
    }


def test_edge_view_tracks_inserts_updates_deletes(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    view = typed_edge_view(GAZ)

    e1 = _events([
        ("I", 1, 0, "d1", [7, 7, 3, 42], "web"),
        ("I", 1, 1, "d2", [11, 5], "crawl"),
        ("I", 1, 2, "d3", [1, 2, 3], "web"),      # no gazetteer hits
        ("I", 1, 3, "d4", None, "feed"),          # null tokens → source only
    ])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    refresh(view, vd, tb, num_partitions=4)
    assert _view_edges(vd) == _oracle_edges(tb)
    assert _oracle_edges(tb)[("d1", "MENTIONS", "tok:7")] == 2  # multiplicity

    # update d1 (old edges retract), delete d2 (edges vanish)
    e2 = _events([
        ("U", 2, 0, "d1", [42], "web"),
        ("D", 2, 1, "d2", None, None),
    ])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    m = refresh(view, vd, tb)
    assert m.epoch_counters.get("mode") == "incremental"
    got = _view_edges(vd)
    assert got == _oracle_edges(tb)
    assert ("d1", "MENTIONS", "tok:7") not in got
    assert not any(src == "d2" for src, _, _ in got)

    # point lookup is the postings path, pruned by leading src key
    probe = edges_of(vd, ["d1"])
    assert {r["rel"] for r in probe.to_pylist()} == {"MENTIONS", "FROM_SOURCE"}
    assert all(r["src"] == "d1" for r in probe.to_pylist())
    assert edges_of(vd, ["d2"]).num_rows == 0


def test_edge_view_signature_refuses_vocab_mismatch(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([("I", 1, 0, "d1", [7], "web")])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=2)
    refresh(typed_edge_view(GAZ), vd, tb, num_partitions=2)
    cur = mf.load_current(vd)
    assert cur.epoch_counters["view_sig"] == typed_edge_view(GAZ).signature()
    assert cur.epoch_counters["view_sig"] != typed_edge_view([1, 2]).signature()


def test_edge_view_subscription_syncs_with_commits(tmp_path):
    """An 'edges' subscription follows the table's commits like the
    other derived-state kinds."""
    from gamechanger_data_ray.engine.subscriptions import subscribe, sync

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "edges")
    e1 = _events([("I", 1, 0, "d1", [7, 42], "web"),
                  ("I", 1, 1, "d2", [11], "crawl")])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=2)
    subscribe(tb, "edges", vd, params={"gazetteer": GAZ})
    rows = sync(tb)
    assert rows and rows[0].get("epoch") == 1
    assert _view_edges(vd) == _oracle_edges(tb)


def test_edge_view_cli_verbs(tmp_path):
    """edges-view / edges-of CLI end-to-end from a bootstrap snapshot
    (in-process main(); Ray is the session fixture's)."""
    import json

    import pyarrow.parquet as pq

    from gamechanger_data_ray.__main__ import main

    snap = str(tmp_path / "snap.parquet")
    pq.write_table(
        pa.table({"doc_id": ["d1", "d2"],
                  "tokens": pa.array([[7, 42, 7], [1, 2]], pa.list_(pa.int32())),
                  "source": ["web", "crawl"]}),
        snap,
    )
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "edges")
    assert main(["bootstrap", "--from", snap, "--table", tb]) == 0
    assert main(["edges-view", "--table", tb, "--view", vd,
                 "--gazetteer", "7,11,42"]) == 0
    assert main(["edges-of", "--view", vd, "--doc-id", "d1"]) == 0
    got = _view_edges(vd)
    assert got[("d1", "MENTIONS", "tok:7")] == 2
    assert got[("d1", "MENTIONS", "tok:42")] == 1
    assert got[("d2", "FROM_SOURCE", "src:crawl")] == 1
    assert not any(rel == "MENTIONS" and src == "d2" for src, rel, _ in got)
