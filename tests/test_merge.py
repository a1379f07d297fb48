"""Unit tests for the pure-Arrow LWW merge kernel (no Ray needed)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from gamechanger_data_ray.core.merge import (
    EVENTS_REP,
    TOMBS_REP,
    drop_tombstones,
    lww_reduce,
    lww_reduce_weighted,
    merge_partition,
)


def ev(rows):
    """rows: list of (op, lsn, seq, doc_id, n_tok)"""
    return pa.table(
        {
            "op": [r[0] for r in rows],
            "lsn": pa.array([r[1] for r in rows], pa.int64()),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
            "version_hash": [f"vh-{r[1]}-{r[2]}" for r in rows],
            "doc_id": [r[3] for r in rows],
            "tokens": pa.array(
                [None if r[0] == "D" else [r[4]] for r in rows], pa.list_(pa.int32())
            ),
            "n_tok": pa.array([None if r[0] == "D" else r[4] for r in rows], pa.int32()),
            "source": ["s"] * len(rows),
        }
    )


def test_lww_picks_highest_lsn_seq():
    t = ev([("I", 1, 0, "a", 10), ("U", 2, 0, "a", 20), ("U", 2, 1, "a", 30)])
    out = lww_reduce(t)
    assert out.num_rows == 1
    assert out["n_tok"][0].as_py() == 30


def test_lww_multiple_keys_and_order_independence():
    rows = [("I", 1, 0, "a", 1), ("I", 1, 1, "b", 2), ("U", 2, 0, "b", 3), ("U", 3, 0, "a", 4)]
    t1 = lww_reduce(ev(rows))
    t2 = lww_reduce(ev(list(reversed(rows))))
    d1 = {r["doc_id"]: r["n_tok"] for r in t1.to_pylist()}
    d2 = {r["doc_id"]: r["n_tok"] for r in t2.to_pylist()}
    assert d1 == d2 == {"a": 4, "b": 3}


def test_tombstone_survives_reduce_then_dropped():
    t = ev([("I", 1, 0, "a", 1), ("D", 2, 0, "a", 0)])
    red = lww_reduce(t)
    assert red.num_rows == 1 and red["op"][0].as_py() == "D"
    assert drop_tombstones(red).num_rows == 0


def test_reduce_is_associative():
    """LWW(LWW(part1), LWW(part2)) == LWW(whole) — the combiner property."""
    rows = [
        ("I", 1, 0, "a", 1),
        ("U", 2, 0, "a", 2),
        ("D", 3, 0, "a", 0),
        ("I", 1, 1, "b", 5),
        ("U", 4, 0, "b", 6),
    ]
    whole = lww_reduce(ev(rows))
    p1, p2 = lww_reduce(ev(rows[:2])), lww_reduce(ev(rows[2:]))
    again = lww_reduce(pa.concat_tables([p1, p2]))
    assert sorted(whole.to_pylist(), key=lambda r: r["doc_id"]) == sorted(
        again.to_pylist(), key=lambda r: r["doc_id"]
    )


def test_weighted_reduce_counts_compose():
    rows = [("I", 1, 0, "a", 1), ("U", 2, 0, "a", 2), ("D", 3, 0, "a", 0), ("I", 1, 1, "b", 5)]
    w = lww_reduce_weighted(ev(rows))
    by_key = {r["doc_id"]: r for r in w.to_pylist()}
    assert by_key["a"][EVENTS_REP] == 3 and by_key["a"][TOMBS_REP] == 1
    assert by_key["b"][EVENTS_REP] == 1 and by_key["b"][TOMBS_REP] == 0
    # reduce of reduced partials sums weights instead of recounting
    w2 = lww_reduce_weighted(pa.concat_tables([w, lww_reduce_weighted(ev([("U", 9, 0, "a", 7)]))]))
    by_key2 = {r["doc_id"]: r for r in w2.to_pylist()}
    assert by_key2["a"][EVENTS_REP] == 4


def test_merge_partition_counters():
    state, c0 = merge_partition(None, ev([("I", 1, 0, "a", 1), ("I", 1, 1, "b", 2)]))
    assert c0 == {
        "events_in": 2,
        "tombstones": 0,
        "upserts": 2,
        "deletes": 0,
        "rows_out": 2,
        "watermark_lsn": 1,
    }
    out, c1 = merge_partition(state, ev([("U", 2, 0, "a", 9), ("D", 2, 1, "b", 0)]))
    assert c1["upserts"] == 1 and c1["deletes"] == 1 and c1["tombstones"] == 1
    assert out.num_rows == 1 and out["doc_id"][0].as_py() == "a"
    assert out["n_tok"][0].as_py() == 9


def test_duplicate_delivery_is_idempotent():
    base = [("I", 1, 0, "a", 1), ("U", 2, 0, "a", 2)]
    once, _ = merge_partition(None, ev(base))
    dup, _ = merge_partition(None, ev(base + base))
    assert once.equals(dup)


def test_empty_events():
    out, c = merge_partition(None, ev([]))
    assert out.num_rows == 0 and c["events_in"] == 0
