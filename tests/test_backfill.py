"""CDC-native backfill (engine/maintenance.py::backfill): re-derive the
payload of every live document as ONE new U-event epoch — versions bump,
the fenced commit applies, and subscribed indexes retract + refold."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.maintenance import backfill, resolve_transform
from gamechanger_data_ray.state import manifest as mf


def _tokens(seed: int, n: int = 40) -> list[int]:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1000, size=n).astype(int).tolist()


def _events(rows):
    op, lsn, seq, doc, toks = zip(*rows)
    t = [list(x) if x is not None else None for x in toks]
    return pa.table({
        "op": pa.array(op, pa.string()),
        "lsn": pa.array(lsn, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "version_hash": pa.array([f"{d}|{l}|{s}" for d, l, s
                                  in zip(doc, lsn, seq)], pa.string()),
        "doc_id": pa.array(doc, pa.string()),
        "tokens": pa.array(t, pa.list_(pa.int32())),
        "n_tok": pa.array([len(x) if x is not None else None for x in t],
                          pa.int32()),
    })


def _make_append_999():
    # a CLOSURE (not a module-level fn): cloudpickle serializes it by
    # value, so Ray workers never need this test module on their path
    def append_999(t: pa.Table) -> pa.Table:
        toks = [x + [999] if x is not None else None
                for x in t["tokens"].to_pylist()]
        i = t.schema.get_field_index("tokens")
        return t.set_column(i, "tokens", pa.array(toks, pa.list_(pa.int32())))

    return append_999


def test_backfill_rewrites_versions_and_resyncs_indexes(tmp_path):
    from gamechanger_data_ray.engine.subscriptions import subscribe

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(20)]
                 + [("I", 1, 99, "d-null", None)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=4)
    subscribe(tb, "dedup", vd)
    from gamechanger_data_ray.engine.subscriptions import sync
    sync(tb)

    r = backfill(tb, _make_append_999(), num_partitions=4)
    assert r["epoch"] == 2 and r["lsn"] == 2
    assert r["docs"] == 21

    t = table_to_arrow(tb)
    rows = {d: (tok, nt, l, vh) for d, tok, nt, l, vh in zip(
        t["doc_id"].to_pylist(), t["tokens"].to_pylist(),
        t["n_tok"].to_pylist(), t["lsn"].to_pylist(),
        t["version_hash"].to_pylist())}
    for i in range(20):
        tok, nt, lsn, vh = rows[f"d{i:03d}"]
        assert tok == _tokens(i) + [999]
        assert nt == len(tok)  # n_tok recomputed, invariant holds
        assert lsn == 2
        assert vh == f"d{i:03d}|2|bf"
    # a null payload stays null (transform preserved it) and n_tok null
    assert rows["d-null"][0] is None and rows["d-null"][1] is None

    # the subscribed dedup index retracted old hashes and folded new ones
    from gamechanger_data_ray.engine.views import view_to_arrow
    got = {(r2["content_hash"], r2["doc_id"])
           for r2 in view_to_arrow(vd).to_pylist()}
    expect = {
        (hashlib.sha256(np.asarray(_tokens(i) + [999],
                                   np.int32).tobytes()).hexdigest(), f"d{i:03d}")
        for i in range(20)
    }
    assert got == expect
    # manifest committed exactly one new epoch
    assert mf.load_current(tb).epoch == 2


def test_backfill_contract_violations_raise(tmp_path):
    tb = str(tmp_path / "tb")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(6)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=2)

    def drops_rows(t: pa.Table) -> pa.Table:
        return t.slice(0, max(0, t.num_rows - 1))

    def mutates_keys(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("doc_id")
        return t.set_column(
            i, "doc_id",
            pc.binary_join_element_wise(t["doc_id"], "x", ""))

    with pytest.raises(Exception, match="preserve row count"):
        backfill(tb, drops_rows, num_partitions=2)
    with pytest.raises(Exception, match="keep 'doc_id'"):
        backfill(tb, mutates_keys, num_partitions=2)
    # failed backfills committed nothing
    assert mf.load_current(tb).epoch == 1

    with pytest.raises(ValueError, match="nothing committed"):
        backfill(str(tmp_path / "empty"), _make_append_999())


def test_backfill_cli_with_plugin_path(tmp_path, monkeypatch):
    """backfill --transform module::func resolves dynamically — the
    reference's --parser-path plugin surface."""
    import json
    import sys

    from gamechanger_data_ray.__main__ import main

    plug = tmp_path / "bf_plugin_mod.py"
    plug.write_text(
        "import pyarrow as pa\n"
        "def double(t):\n"
        "    toks = [x * 2 if x is not None else None\n"
        "            for x in t['tokens'].to_pylist()]\n"
        "    i = t.schema.get_field_index('tokens')\n"
        "    return t.set_column(i, 'tokens', pa.array(toks, pa.list_(pa.int32())))\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))

    tb = str(tmp_path / "tb")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i, n=8)) for i in range(5)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=2)
    assert main(["backfill", "--table", tb,
                 "--transform", "bf_plugin_mod::double"]) == 0
    t = table_to_arrow(tb)
    rows = {d: tok for d, tok in zip(t["doc_id"].to_pylist(),
                                     t["tokens"].to_pylist())}
    assert rows["d000"] == _tokens(0, n=8) * 2

    with pytest.raises(ValueError, match="module::func"):
        resolve_transform("no-separator")
