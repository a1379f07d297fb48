"""Incremental equi-join views between two co-partitioned CDC tables
(engine/join_views.py): correctness vs a DuckDB join oracle, incremental
== rebuild equivalence, O(changed partitions) refresh, and the
co-partitioning guard."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.join_views import (
    read_join_view,
    refresh_join,
)

P = 4


def _events(rows: list[tuple], payload: str) -> pa.Table:
    op, lsn, seq, doc, val = zip(*rows)
    return pa.table(
        {
            "op": pa.array(op, pa.string()),
            "lsn": pa.array(lsn, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(doc, pa.string()),
            payload: pa.array(val, pa.string()),
        }
    )


def _apply(tb: str, epoch: int, events: pa.Table) -> None:
    apply_events_dataset(
        ray.data.from_arrow(events), tb, epoch, events.schema, num_partitions=P
    )


def _oracle_inner(lt: pa.Table, rt: pa.Table) -> list[tuple]:
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    return con.execute(
        "SELECT l.doc_id, l.title, r.body FROM l JOIN r USING (doc_id) "
        "ORDER BY doc_id"
    ).fetchall()


def _got(vd: str) -> list[tuple]:
    t = read_join_view(vd).to_pandas().sort_values("doc_id")
    return list(t[["doc_id", "title", "body"]].itertuples(index=False, name=None))


def _seed(tmp_path):
    lt, rt, vd = str(tmp_path / "l"), str(tmp_path / "r"), str(tmp_path / "v")
    _apply(lt, 1, _events(
        [("I", 1, i, f"d{i:03d}", f"title-{i}") for i in range(20)], "title"))
    _apply(rt, 1, _events(
        [("I", 1, i, f"d{i:03d}", f"body-{i}") for i in range(10, 25)], "body"))
    return lt, rt, vd


def test_join_view_matches_duckdb_oracle(tmp_path):
    lt, rt, vd = _seed(tmp_path)
    m = refresh_join(vd, lt, rt)
    assert m is not None and m.epoch_counters["mode"] == "full"
    assert _got(vd) == _oracle_inner(table_to_arrow(lt), table_to_arrow(rt))
    # already current → no-op
    assert refresh_join(vd, lt, rt) is None


def test_incremental_refresh_touches_only_changed_partitions(tmp_path):
    lt, rt, vd = _seed(tmp_path)
    refresh_join(vd, lt, rt)
    # one update + one delete on the LEFT, keys that land in ≤2 partitions
    _apply(lt, 2, _events(
        [("U", 2, 0, "d012", "title-12-v2"), ("D", 2, 1, "d015", "")], "title"))
    m = refresh_join(vd, lt, rt)
    assert m is not None and m.epoch_counters["mode"] == "incremental"
    assert 0 < m.epoch_counters["dirty_partitions"] < P
    # incremental result == a from-scratch rebuild == the oracle
    vd2 = str(tmp_path / "v2")
    refresh_join(vd2, lt, rt)
    assert _got(vd) == _got(vd2)
    assert _got(vd) == _oracle_inner(table_to_arrow(lt), table_to_arrow(rt))
    # the deleted key fell out of the join
    assert all(d != "d015" for d, _, _ in _got(vd))


def test_both_sides_advance_between_refreshes(tmp_path):
    lt, rt, vd = _seed(tmp_path)
    refresh_join(vd, lt, rt)
    _apply(lt, 2, _events([("I", 2, 0, "d030", "title-30")], "title"))
    _apply(rt, 2, _events(
        [("I", 2, 0, "d030", "body-30"), ("U", 2, 1, "d011", "body-11-v2")],
        "body"))
    m = refresh_join(vd, lt, rt)
    assert m is not None
    got = _got(vd)
    assert got == _oracle_inner(table_to_arrow(lt), table_to_arrow(rt))
    assert ("d030", "title-30", "body-30") in got
    assert ("d011", "title-11", "body-11-v2") in got


def test_left_outer_join_view(tmp_path):
    lt, rt, vd = _seed(tmp_path)
    m = refresh_join(vd, lt, rt, how="left_outer")
    assert m is not None
    t = read_join_view(vd).to_pandas()
    assert len(t) == 20  # every left row survives
    assert t["body"].isna().sum() == 10  # d000..d009 have no right match


def test_overlapping_payload_columns_get_suffixes(tmp_path):
    lt, rt = str(tmp_path / "l"), str(tmp_path / "r")
    _apply(lt, 1, _events([("I", 1, 0, "k1", "from-left")], "note"))
    _apply(rt, 1, _events([("I", 1, 0, "k1", "from-right")], "note"))
    vd = str(tmp_path / "v")
    refresh_join(vd, lt, rt)
    t = read_join_view(vd).to_pandas()
    assert "note_l" in t.columns and "note_r" in t.columns
    assert list(t["note_l"]) == ["from-left"]
    assert list(t["note_r"]) == ["from-right"]


def test_nested_list_payloads_join(tmp_path):
    """Acero rejects nested non-key columns — the index-pair join path
    must carry a tokens list<int32> payload through intact."""
    lt, rt = str(tmp_path / "l"), str(tmp_path / "r")
    toks = pa.table({
        "op": pa.array(["I", "I"]), "lsn": pa.array([1, 1], pa.int64()),
        "seq": pa.array([0, 1], pa.int64()),
        "doc_id": pa.array(["a", "b"]),
        "tokens": pa.array([[1, 2, 3], [4]], pa.list_(pa.int32())),
    })
    _apply(lt, 1, toks)
    _apply(rt, 1, _events([("I", 1, 0, "a", "body-a")], "body"))
    vd = str(tmp_path / "v")
    refresh_join(vd, lt, rt)
    t = read_join_view(vd).to_pandas()
    assert len(t) == 1
    assert list(t["tokens"].iloc[0]) == [1, 2, 3]
    assert t["body"].iloc[0] == "body-a"


def test_mismatched_partitioning_is_rejected(tmp_path):
    lt, rt = str(tmp_path / "l"), str(tmp_path / "r")
    _apply(lt, 1, _events([("I", 1, 0, "k1", "x")], "title"))
    ev = _events([("I", 1, 0, "k1", "y")], "body")
    apply_events_dataset(
        ray.data.from_arrow(ev), rt, 1, ev.schema, num_partitions=P * 2
    )
    import pytest

    with pytest.raises(ValueError, match="co-partitioned"):
        refresh_join(str(tmp_path / "v"), lt, rt)


def test_changed_join_definition_is_rejected(tmp_path):
    lt, rt, vd = _seed(tmp_path)
    refresh_join(vd, lt, rt)
    _apply(lt, 2, _events([("I", 2, 0, "d031", "t")], "title"))
    import pytest

    with pytest.raises(ValueError, match="join definition changed"):
        refresh_join(vd, lt, rt, how="left_outer")
