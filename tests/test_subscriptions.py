"""Standing subscriptions (engine/subscriptions.py): derived state —
views, search indexes, downstream relay tables — declared once on a
table and brought to its committed epoch by replay itself, replacing
the reference's run-each-reindex-step-by-hand orchestration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.search_index import bm25_search
from gamechanger_data_ray.engine.subscriptions import (
    list_subscriptions,
    subscribe,
    sync,
    unsubscribe,
)
from gamechanger_data_ray.engine.views import view_to_arrow
from gamechanger_data_ray.state import manifest as mf

DIM = 8


def _events(rows):
    op, lsn, seq, doc, text, src = zip(*rows)
    rng = np.random.default_rng(11)
    emb = [rng.standard_normal(DIM).tolist() if o != "D" else None for o in op]
    return pa.table(
        {
            "op": pa.array(op, pa.string()),
            "lsn": pa.array(lsn, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(doc, pa.string()),
            "text": pa.array(text, pa.string()),
            "source": pa.array(src, pa.string()),
            "embedding": pa.array(emb, pa.list_(pa.float64())),
        }
    )


def _epoch1(tmp_path):
    tb = str(tmp_path / "tb")
    rows = [("I", 1, i, f"d{i:03d}", f"merge batch doc {i}", f"s{i % 2}")
            for i in range(12)]
    e1 = _events(rows)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=4)
    return tb


def test_registry_roundtrip_and_guards(tmp_path):
    tb = _epoch1(tmp_path)
    with pytest.raises(ValueError, match="unknown subscription kind"):
        subscribe(tb, "nope", str(tmp_path / "x"))
    with pytest.raises(ValueError, match="group_by"):
        subscribe(tb, "agg", str(tmp_path / "x"))
    with pytest.raises(ValueError, match="itself"):
        subscribe(tb, "relay", tb)
    subscribe(tb, "agg", str(tmp_path / "v"), {"group_by": ["source"]})
    subscribe(tb, "agg", str(tmp_path / "v"),
              {"group_by": ["source"], "sums": {"s": "lsn"}})  # replaces
    subs = list_subscriptions(tb)
    assert len(subs) == 1 and subs[0]["params"]["sums"] == {"s": "lsn"}
    assert unsubscribe(tb, str(tmp_path / "v")) == []


def test_sync_all_kinds_and_replayless_catchup(tmp_path):
    tb = _epoch1(tmp_path)
    v, inv, ann, bidx, dst = (str(tmp_path / n)
                              for n in ("v", "inv", "ann", "bidx", "dst"))
    subscribe(tb, "agg", v, {"group_by": ["source"], "num_partitions": 2})
    subscribe(tb, "inverted", inv, {"num_partitions": 2})
    subscribe(tb, "ann", ann, {"dim": DIM, "n_planes": 4, "num_partitions": 2})
    subscribe(tb, "bm25", bidx, {"num_partitions": 2})
    subscribe(tb, "relay", dst, {"num_partitions": 4})
    out = sync(tb)
    assert len(out) == 5 and all("error" not in r for r in out)

    # every subscriber sits at the table's committed epoch
    for d in (v, inv, ann, dst):
        assert mf.load_current(d).epoch == 1
    assert mf.load_current(f"{bidx}/inv").epoch == 1
    # and the derived state is queryable/correct
    agg = {r["source"]: r["n_rows"] for r in view_to_arrow(v).to_pylist()}
    assert agg == {"s0": 6, "s1": 6}
    assert table_to_arrow(dst).num_rows == 12
    assert bm25_search(bidx, tb, "merge", k=3).num_rows == 3

    # second sync is a fenced no-op everywhere
    out2 = sync(tb)
    assert all(r.get("mode") in ("current", "noop", None) or
               isinstance(r.get("epoch"), dict) for r in out2)


def test_replay_auto_syncs_subscribers(tmp_path):
    """The tail loop maintains the derived state: commit epoch 2 via
    replay and every subscriber follows without an explicit sync."""
    from gamechanger_data_ray.core.changelog import write_changelog
    from gamechanger_data_ray.engine.cdc import replay

    cl, tb = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cl, num_epochs=2, events_per_epoch=300, num_keys=60)
    replay(cl, tb, num_partitions=4, up_to_epoch=1)

    v, dst = str(tmp_path / "v"), str(tmp_path / "dst")
    subscribe(tb, "agg", v, {"group_by": ["source"], "sums": {"tok": "n_tok"}})
    subscribe(tb, "relay", dst, {})
    replay(cl, tb, num_partitions=4)  # epoch 2 commit → auto-sync
    assert mf.load_current(tb).epoch == 2
    assert mf.load_current(v).epoch == 2
    assert mf.load_current(dst).epoch == 2
    # relay copy is byte-identical to the source state
    assert table_to_arrow(dst).sort_by("doc_id").equals(
        table_to_arrow(tb).sort_by("doc_id"))


def test_sync_failure_isolation(tmp_path):
    """One broken subscriber doesn't starve the rest; the error names
    the target and the next sync reconverges after unsubscribe."""
    tb = _epoch1(tmp_path)
    v = str(tmp_path / "v")
    bad = str(tmp_path / "badagg")
    subscribe(tb, "agg", bad, {"group_by": ["no_such_column"]})
    subscribe(tb, "agg", v, {"group_by": ["source"]})
    with pytest.raises(RuntimeError, match="badagg"):
        sync(tb)
    assert mf.load_current(v).epoch == 1  # the good one still synced
    unsubscribe(tb, bad)
    assert all("error" not in r for r in sync(tb))


def test_replay_commit_survives_broken_subscriber(tmp_path):
    """A failing subscriber must not mask a successful ingest: replay
    commits, returns the manifest, records a failed `sync` job row, and
    an explicit sync() still raises for the operator to see."""
    from gamechanger_data_ray.core.changelog import write_changelog
    from gamechanger_data_ray.engine.cdc import replay
    from gamechanger_data_ray.engine.jobs import job_history

    cl, tb = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cl, num_epochs=1, events_per_epoch=100, num_keys=30)
    subscribe(tb, "agg", str(tmp_path / "bad"), {"group_by": ["no_such_col"]})
    m = replay(cl, tb, num_partitions=2)
    assert m is not None and m.epoch == 1  # commit unaffected
    fails = [j for j in job_history(tb)
             if j["job_type"] == "sync" and j["status"] == "Failed"]
    assert fails and "no_such_col" in fails[-1]["error"]
    with pytest.raises(RuntimeError):
        sync(tb)


def test_subscription_cli_verbs(tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from gamechanger_data_ray.__main__ import main

    snap = str(tmp_path / "snap.parquet")
    pq.write_table(
        pa.table({"doc_id": [f"d{i}" for i in range(6)],
                  "text": [f"merge batch {i}" for i in range(6)],
                  "source": ["a", "b"] * 3}),
        snap,
    )
    tb, v = str(tmp_path / "tb"), str(tmp_path / "v")
    assert main(["bootstrap", "--from", snap, "--table", tb]) == 0
    assert main(["subscribe", "--table", tb, "--kind", "agg",
                 "--target", v, "--params", '{"group_by": ["source"]}']) == 0
    assert main(["sync", "--table", tb]) == 0
    capsys.readouterr()
    assert main(["subscriptions", "--table", tb]) == 0
    listed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert listed["subscriptions"][0]["kind"] == "agg"
    assert mf.load_current(v).epoch == 0
    assert main(["unsubscribe", "--table", tb, "--target", v]) == 0
