"""Snapshot bootstrap (epoch-0 genesis load, then tail): snapshot parquet
→ table state identity, seamless handoff to changelog replay at epoch 1,
content-deterministic dedup of duplicate snapshot keys, key-column rename,
and the already-committed guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import (
    bootstrap_table,
    replay,
    table_to_arrow,
)

P = 4


def _snapshot(path: str, n: int = 40, key: str = "doc_id") -> pa.Table:
    t = pa.table({
        key: pa.array([f"doc-{i:05d}" for i in range(n)]),
        "tokens": pa.array([[i, i + 1] for i in range(n)], pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 2, dtype=np.int32)),
        "source": pa.array(["snap"] * n),
    })
    pq.write_table(t, path)
    return t


def test_bootstrap_state_identity(tmp_path):
    snap = str(tmp_path / "snap.parquet")
    tb = str(tmp_path / "tb")
    src = _snapshot(snap)
    m = bootstrap_table(snap, tb, num_partitions=P)
    assert m.epoch == 0
    assert m.totals == {"events_in": 40, "upserts": 40, "deletes": 0,
                        "tombstones": 0, "rows": 40}
    got = table_to_arrow(tb)
    assert got.num_rows == 40
    gp = got.to_pandas().sort_values("doc_id").reset_index(drop=True)
    sp = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_tok", "source"):
        assert list(gp[c]) == list(sp[c])
    assert [list(x) for x in gp["tokens"]] == [list(x) for x in sp["tokens"]]
    assert set(gp["lsn"]) == {0}
    assert set(gp["op"]) <= {"I"}


def test_bootstrap_then_tail_from_epoch_1(tmp_path):
    """The genesis commit at epoch 0 hands off to replay with no gap and
    no re-apply: epoch-1+ changelog events update the snapshot rows."""
    snap, cl, tb = (str(tmp_path / p) for p in ("snap.parquet", "cl", "tb"))
    _snapshot(snap, n=30)
    bootstrap_table(snap, tb, num_partitions=P)
    write_changelog(cl, num_epochs=2, events_per_epoch=100, num_keys=30)
    m = replay(cl, tb, num_partitions=P)
    assert m.epoch == 2
    got = table_to_arrow(tb).to_pandas()
    # every surviving row is either an untouched snapshot row (lsn 0) or
    # the changelog's LWW winner (lsn 1..2); no key appears twice
    assert got["doc_id"].is_unique
    assert set(got["lsn"]) <= {0, 1, 2}
    assert (got["lsn"] > 0).any()


def test_duplicate_keys_resolve_by_content_hash(tmp_path):
    """Duplicate snapshot keys pick a winner from version_hash content —
    identical across re-runs and block orders, and reported in totals."""
    tb1, tb2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    rows = pa.table({
        "doc_id": pa.array(["a", "a", "b"]),
        "version_hash": pa.array(["h1", "h2", "h3"]),
        "source": pa.array(["x", "y", "z"]),
    })
    p1 = str(tmp_path / "s1.parquet")
    pq.write_table(rows, p1)
    m = bootstrap_table(p1, tb1, num_partitions=P)
    assert m.totals["events_in"] == 3 and m.totals["rows"] == 2
    # reversed row order → same winner
    p2 = str(tmp_path / "s2.parquet")
    pq.write_table(rows.take(pa.array([1, 0, 2])), p2)
    bootstrap_table(p2, tb2, num_partitions=P)
    g1 = table_to_arrow(tb1).to_pandas().sort_values("doc_id")
    g2 = table_to_arrow(tb2).to_pandas().sort_values("doc_id")
    assert list(g1["version_hash"]) == list(g2["version_hash"])


def test_key_rename_and_committed_guard(tmp_path):
    snap, tb = str(tmp_path / "s.parquet"), str(tmp_path / "tb")
    _snapshot(snap, n=10, key="pub_id")
    m = bootstrap_table(snap, tb, num_partitions=P, key="pub_id")
    got = table_to_arrow(tb)
    assert "doc_id" in got.schema.names and "pub_id" not in got.schema.names
    assert m.totals["rows"] == 10
    with pytest.raises(FileExistsError):
        bootstrap_table(snap, tb, num_partitions=P, key="pub_id")
    with pytest.raises(ValueError):
        bootstrap_table(snap, str(tmp_path / "tb3"), key="missing_col")


def test_bootstrap_coalesce_mode_then_partial_tail(tmp_path):
    """A coalesce table is born at genesis: bootstrap pins the mode so the
    partial-image tail is accepted (and a replace tail refused)."""
    import ray.data

    from gamechanger_data_ray.engine.cdc import apply_events_dataset

    snap, tb = str(tmp_path / "s.parquet"), str(tmp_path / "tb")
    _snapshot(snap, n=8)
    bootstrap_table(snap, tb, num_partitions=P, update_mode="coalesce")
    # partial update: only source set; tokens/n_tok stay from the snapshot
    t = pa.table({
        "op": pa.array(["U"]), "lsn": pa.array([1], pa.int64()),
        "seq": pa.array([0], pa.int64()), "doc_id": pa.array(["doc-00003"]),
        "tokens": pa.array([None], pa.list_(pa.int32())),
        "n_tok": pa.array([None], pa.int32()),
        "source": pa.array(["patched"]),
    })
    apply_events_dataset(ray.data.from_arrow(t), tb, 1, t.schema,
                         num_partitions=P, update_mode="coalesce")
    rows = {r["doc_id"]: r for r in table_to_arrow(tb).to_pylist()}
    assert rows["doc-00003"]["source"] == "patched"
    assert rows["doc-00003"]["tokens"] == [3, 4]  # snapshot cells kept
    with pytest.raises(ValueError, match="update_mode"):
        apply_events_dataset(ray.data.from_arrow(t), tb, 2, t.schema,
                             num_partitions=P)  # replace refused


def test_reserved_bookkeeping_names_rejected(tmp_path):
    """A snapshot payload column named op/lsn/seq would silently vanish
    into the event bookkeeping — refuse instead."""
    p = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({"doc_id": ["a"], "seq": [1], "v": ["x"]}), p)
    with pytest.raises(ValueError, match="reserved"):
        bootstrap_table(p, str(tmp_path / "tb"), num_partitions=P)
