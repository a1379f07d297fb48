"""Bulk predicate delete (engine/maintenance.py::delete_where): matching
rows become one fenced D-event epoch; zone maps prune the scan;
subscribed views retract; rerun is a clean no-op."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.maintenance import delete_where
from gamechanger_data_ray.engine.subscriptions import subscribe
from gamechanger_data_ray.engine.views import view_to_arrow


def _events(rows):
    op, lsn, seq, doc, ntok, src = zip(*rows)
    return pa.table({
        "op": pa.array(op, pa.string()),
        "lsn": pa.array(lsn, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "doc_id": pa.array(doc, pa.string()),
        "tokens": pa.array([[1, 2]] * len(rows), pa.list_(pa.int32())),
        "n_tok": pa.array(ntok, pa.int32()),
        "source": pa.array(src, pa.string()),
    })


@pytest.fixture()
def table(ray_session, tmp_path):
    tb = str(tmp_path / "tb")
    rows = [("I", 1, i, f"d{i:03d}", 10 * (i + 1), f"s{i % 2}")
            for i in range(20)]  # n_tok 10..200
    e1 = _events(rows)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=4)
    return tb


def test_delete_where_bounds_retracts_subscribers(table, tmp_path):
    from gamechanger_data_ray.engine.subscriptions import sync

    vd = str(tmp_path / "view")
    subscribe(table, "agg", vd, params={"group_by": ["source"],
                                        "sums": {"sum_tok": "n_tok"}})
    sync(table)
    before = view_to_arrow(vd)
    assert sum(before["n_rows"].to_pylist()) == 20

    out = delete_where(table, bounds={"n_tok": (None, 100)})
    assert out["mode"] == "delete" and out["deletes"] == 10
    assert out["epoch"] == 2
    t = table_to_arrow(table)
    assert t.num_rows == 10
    assert min(t["n_tok"].to_pylist()) == 110
    # the subscribed view retracted the deleted rows in the same call
    after = view_to_arrow(vd)
    assert sum(after["n_rows"].to_pylist()) == 10
    assert sum(after["sum_tok"].to_pylist()) == sum(range(110, 201, 10))

    # rerun: nothing matches, NO epoch burned
    again = delete_where(table, bounds={"n_tok": (None, 100)})
    assert again["mode"] == "noop" and again["epoch"] is None
    from gamechanger_data_ray.state import manifest as mf
    assert mf.load_current(table).epoch == 2


def test_delete_where_refuses_full_table(table):
    with pytest.raises(ValueError, match="full-table"):
        delete_where(table)


def test_delete_where_predicate_and_skipping(ray_session, tmp_path):
    """A predicate expression works; bounds on a key-correlated column
    report zone-map partition skips."""
    import pyarrow.compute as pc

    tb = str(tmp_path / "tb")
    rows = [("I", 1, i, f"d{i:03d}", 10 * (i + 1), f"s{i % 2}")
            for i in range(20)]
    e1 = _events(rows)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=4)
    out = delete_where(tb, predicate=(pc.field("source") == "s1"))
    assert out["deletes"] == 10
    assert set(table_to_arrow(tb)["source"].to_pylist()) == {"s0"}
    # bounds proven empty by zone maps: every partition skipped, noop
    out2 = delete_where(tb, bounds={"n_tok": (10_000, None)})
    assert out2["mode"] == "noop"
    assert out2["partitions_skipped"] == 4


def test_delete_where_cli(tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo")

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "gamechanger_data_ray", *argv],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-800:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    cl, tb = str(tmp_path / "cl"), str(tmp_path / "tb")
    run("generate", "--out", cl, "--epochs", "2", "--events", "400",
        "--keys", "80")
    st = run("--num-cpus", "4", "replay", "--changelog", cl, "--table", tb,
             "--partitions", "4")
    rows_before = st["totals"]["rows"]
    out = run("--num-cpus", "4", "delete-where", "--table", tb,
              "--bounds", "n_tok::64")
    assert out["mode"] == "delete" and out["deletes"] > 0
    st2 = run("status", "--table", tb)
    assert st2["totals"]["rows"] == rows_before - out["deletes"]


def test_ttl_policy_autopilot_plans_and_applies(ray_session, tmp_path):
    """Standing row TTL: cutoff derives from committed zone maps (global
    column max - keep), autopilot plans the delete-where sweep, applies
    it, and the next plan is quiet (remaining mins sit above cutoff)."""
    from gamechanger_data_ray.engine import autopilot
    from gamechanger_data_ray.engine.maintenance import (
        set_ttl_policy,
        ttl_cutoff,
        ttl_policy,
    )

    tb = str(tmp_path / "tb")
    rows = [("I", 1, i, f"d{i:03d}", 10 * (i + 1), f"s{i % 2}")
            for i in range(20)]  # n_tok 10..200 doubles as the TTL axis
    e1 = _events(rows)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=4)
    assert ttl_policy(tb) is None and ttl_cutoff(tb) is None
    set_ttl_policy(tb, "n_tok", keep=50)  # keep rows with n_tok > 150
    cutoff, expired = ttl_cutoff(tb)
    assert cutoff == 150 and expired > 0

    plan = autopilot.plan(tb)
    dw = [a for a in plan if a["op"] == "delete-where"]
    assert dw and dw[0]["bounds"] == {"n_tok": [None, 150]}
    report = autopilot.apply(tb, dw)
    assert report[0]["mode"] == "delete" and report[0]["deletes"] == 15
    t = table_to_arrow(tb)
    assert sorted(t["n_tok"].to_pylist()) == [160, 170, 180, 190, 200]
    # quiescent: nothing expired anymore → no delete planned
    assert not [a for a in autopilot.plan(tb) if a["op"] == "delete-where"]
    # clearing the policy stops planning entirely
    set_ttl_policy(tb, "n_tok", keep=0)
    assert ttl_policy(tb) is None
