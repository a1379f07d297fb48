"""Incrementally-maintained exact-dup content-hash index
(engine/dedup_index.py): postings exactness vs a serial recompute
through update/delete epochs, exact-twin search, and the ingest gate's
``exact`` mode (suppress identical payloads, pass near-misses)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.dedup_index import (
    content_hashes,
    content_index_view,
    dup_search,
)
from gamechanger_data_ray.engine.ingest_gate import (
    JACCARD_COLUMN,
    MATCH_COLUMN,
    apply_with_neardup_gate,
    read_quarantine,
    screen_events,
)
from gamechanger_data_ray.engine.views import refresh, view_to_arrow


def _tokens(seed: int, n: int = 60) -> list[int]:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 50, size=n).astype(int).tolist()


def _events(rows):
    op, lsn, seq, doc, toks = zip(*rows)
    return pa.table({
        "op": pa.array(op, pa.string()),
        "lsn": pa.array(lsn, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "doc_id": pa.array(doc, pa.string()),
        "tokens": pa.array(
            [list(t) if t is not None else None for t in toks],
            pa.list_(pa.int32())),
    })


def _sha(toks: list[int]) -> str:
    return hashlib.sha256(np.asarray(toks, np.int32).tobytes()).hexdigest()


def _oracle_postings(tb: str) -> set[tuple[str, str]]:
    t = table_to_arrow(tb)
    toks = t["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    t = t.filter(toks.is_valid())
    return {
        (_sha(tok), did)
        for did, tok in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist())
    }


def test_content_hashes_matches_serial_and_handles_slices():
    toks = pa.array([_tokens(1), _tokens(2, n=3), []], pa.list_(pa.int32()))
    got = content_hashes(toks).to_pylist()
    assert got == [_sha(_tokens(1)), _sha(_tokens(2, n=3)), _sha([])]
    # a sliced array must hash the same rows (absolute-offset slicing)
    assert content_hashes(toks.slice(1)).to_pylist() == got[1:]


def test_content_postings_and_incremental_maintenance(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(30)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    view = content_index_view()
    m = refresh(view, vd, tb, num_partitions=4)
    assert m is not None and m.epoch_counters["mode"] == "full"
    got = {(r["content_hash"], r["doc_id"])
           for r in view_to_arrow(vd).to_pylist()}
    assert got == _oracle_postings(tb)

    # update d005 (old hash retracts), delete d007, null-payload insert
    e2 = _events([("U", 2, 0, "d005", _tokens(777)),
                  ("D", 2, 1, "d007", None),
                  ("I", 2, 2, "d-null", None)])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    m2 = refresh(view, vd, tb)
    assert m2 is not None and m2.epoch_counters["mode"] == "incremental"
    got2 = {(r["content_hash"], r["doc_id"])
            for r in view_to_arrow(vd).to_pylist()}
    assert got2 == _oracle_postings(tb)
    assert not any(d in ("d007", "d-null") for _, d in got2)
    assert (_sha(_tokens(5)), "d005") not in got2
    assert (_sha(_tokens(777)), "d005") in got2


def test_dup_search_exact_twins_and_guards(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    base = _tokens(42, n=120)
    rows = [("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(25)]
    rows += [("I", 1, 25, "twin-a", list(base)),
             ("I", 1, 26, "twin-b", list(base)),
             ("I", 1, 27, "near", list(base[:-1]) + [base[-1] + 1])]
    e1 = _events(rows)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    view = content_index_view()
    refresh(view, vd, tb, num_partitions=4)

    res = dup_search(vd, tb, ["twin-a"]).to_pylist()
    assert [r["doc_id"] for r in res] == ["twin-b"]
    # a one-token difference is NOT an exact dup
    assert dup_search(vd, tb, ["near"]).num_rows == 0
    # symmetric probe
    assert [r["doc_id"] for r in dup_search(vd, tb, ["twin-b"]).to_pylist()] == [
        "twin-a"]

    # rewrite twin-b: the pair must vanish after refresh (stale refuses)
    e2 = _events([("U", 2, 0, "twin-b", _tokens(888, n=120))])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    with pytest.raises(ValueError, match="stale"):
        dup_search(vd, tb, ["twin-a"])
    refresh(view, vd, tb)
    assert dup_search(vd, tb, ["twin-a"]).num_rows == 0

    # payload-column mismatch refuses loudly (baked into the signature)
    with pytest.raises(ValueError, match="signature mismatch"):
        dup_search(vd, tb, ["twin-a"], tokens_column="other_tokens")


def test_exact_gate_suppresses_identical_passes_near(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i, n=120)) for i in range(20)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    refresh(content_index_view(), vd, tb, num_partitions=4)

    base = _tokens(3, n=120)  # committed as d003
    near = list(base)
    near[0] += 1000
    e2 = _events([
        ("I", 2, 0, "spam-exact", list(base)),      # identical → suppressed
        ("I", 2, 1, "spam-near", near),             # 1 token off → PASSES
        ("I", 2, 2, "novel", _tokens(999, n=120)),  # unrelated → passes
        ("U", 2, 3, "d003", list(base)),            # self re-upload → passes
        ("D", 2, 4, "d000", None),                  # delete → passes
    ])
    res = apply_with_neardup_gate(
        ray.data.from_arrow(e2), tb, vd, 2, e2.schema,
        num_partitions=4, mode="exact")
    assert res["suppressed"] == 1
    final = table_to_arrow(tb)
    ids = set(final["doc_id"].to_pylist())
    assert "spam-exact" not in ids
    assert {"spam-near", "novel", "d003"} <= ids
    assert "d000" not in ids
    q = read_quarantine(tb, 2)
    assert q.num_rows == 1
    row = q.to_pylist()[0]
    assert row["doc_id"] == "spam-exact"
    assert row[MATCH_COLUMN] == "d003"
    assert row[JACCARD_COLUMN] == 1.0
    assert "tokens" not in q.schema.names  # payload never quarantined

    # epoch currency: a dup of epoch-2's admitted doc is caught at epoch 3
    e3 = _events([("I", 3, 0, "spam-of-novel", _tokens(999, n=120))])
    res3 = apply_with_neardup_gate(
        ray.data.from_arrow(e3), tb, vd, 3, e3.schema,
        num_partitions=4, mode="exact")
    assert res3["suppressed"] == 1
    assert "spam-of-novel" not in set(table_to_arrow(tb)["doc_id"].to_pylist())


def test_dedup_subscription_syncs_with_replay(tmp_path):
    """A 'dedup' subscription follows the table's commits like the other
    derived-state kinds."""
    from gamechanger_data_ray.engine.subscriptions import subscribe, sync

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(12)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    subscribe(tb, "dedup", vd)
    rows = sync(tb)
    assert rows and rows[0].get("epoch") == 1
    got = {(r["content_hash"], r["doc_id"])
           for r in view_to_arrow(vd).to_pylist()}
    assert got == _oracle_postings(tb)


def test_dedup_cli_verbs(tmp_path):
    """dedup-view / dedup-search / replay-gated --mode exact end-to-end
    (in-process main(); Ray is the session fixture's)."""
    import json

    import pyarrow.parquet as pq

    from gamechanger_data_ray.__main__ import main

    base = _tokens(4, n=100)
    snap = str(tmp_path / "snap.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [f"d{i:02d}" for i in range(10)] + ["twin-a", "twin-b"],
            "tokens": pa.array(
                [_tokens(i) for i in range(10)] + [base, list(base)],
                pa.list_(pa.int32())),
        }),
        snap,
    )
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    assert main(["bootstrap", "--from", snap, "--table", tb]) == 0
    assert main(["dedup-view", "--table", tb, "--view", vd]) == 0
    assert main(["dedup-search", "--table", tb, "--view", vd,
                 "--doc-id", "twin-a"]) == 0


def test_replay_gated_exact_mode_cli(tmp_path):
    """replay-gated --mode exact over a generated changelog: runs clean
    and commits every ready epoch with the content index current."""
    from gamechanger_data_ray.__main__ import main
    from gamechanger_data_ray.state import manifest as mf

    cl, tb, vd = (str(tmp_path / "cl"), str(tmp_path / "tb"),
                  str(tmp_path / "idx"))
    assert main(["generate", "--out", cl, "--epochs", "2", "--events", "600",
                 "--keys", "80", "--zipf", "1.2"]) == 0
    assert main(["replay-gated", "--changelog", cl, "--table", tb,
                 "--view", vd, "--mode", "exact", "--partitions", "4"]) == 0
    cur_t, cur_v = mf.load_current(tb), mf.load_current(vd)
    assert cur_t is not None and cur_v is not None
    assert cur_t.epoch == cur_v.epoch == 2


def test_exact_gate_mode_signature_guard(tmp_path):
    """Screening in 'exact' mode against a NEAR-DUP index dir refuses —
    the two postings layouts must never silently mix."""
    from gamechanger_data_ray.engine.neardup_index import neardup_index_view

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(8)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=2)
    refresh(neardup_index_view(k=5), vd, tb, num_partitions=2)
    with pytest.raises(ValueError, match="signature mismatch"):
        screen_events(ray.data.from_arrow(e1), tb, vd, mode="exact")
    with pytest.raises(ValueError, match="unknown gate mode"):
        screen_events(ray.data.from_arrow(e1), tb, vd, mode="fuzzy")
