"""Ingest-time near-dup suppression (engine/ingest_gate.py): screening
semantics (suppress near-dups of committed docs, keep novel docs and
self-updates, pass deletes), quarantine audit trail idempotence, guard
behavior, and the gate keeping the index current across epochs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.ingest_gate import (
    JACCARD_COLUMN,
    MATCH_COLUMN,
    apply_with_neardup_gate,
    read_quarantine,
    screen_events,
)
from gamechanger_data_ray.engine.neardup_index import neardup_index_view
from gamechanger_data_ray.engine.views import refresh
from gamechanger_data_ray.stages.dedup import token_shingle_jaccard

K = 5


def _tokens(seed: int, n: int = 60) -> list[int]:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 50, size=n).astype(int).tolist()


def _near(base: list[int], flips: int, seed: int) -> list[int]:
    rng = np.random.default_rng(seed)
    out = list(base)
    for i in rng.choice(len(out), size=flips, replace=False):
        out[int(i)] = int(out[int(i)]) + 1000
    return out


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


@pytest.fixture()
def gated_table(tmp_path):
    """Epoch-1 corpus committed + index refreshed."""
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i, n=120)) for i in range(20)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    refresh(neardup_index_view(k=K), vd, tb, num_partitions=4)
    return tb, vd


def test_gate_suppresses_near_dups_keeps_novel_and_self(gated_table):
    tb, vd = gated_table
    base = _tokens(3, n=120)          # committed as d003
    nearby = _near(base, flips=4, seed=7)
    e2 = _events([
        ("I", 2, 0, "spam-exact", list(base)),      # exact dup of d003
        ("I", 2, 1, "spam-near", nearby),           # near dup of d003
        ("I", 2, 2, "novel", _tokens(999, n=120)),  # unrelated
        ("U", 2, 3, "d003", _near(base, flips=1, seed=8)),  # self-update
        ("D", 2, 4, "d000", None),                  # delete passes
    ])
    res = apply_with_neardup_gate(
        ray.data.from_arrow(e2), tb, vd, 2, e2.schema,
        num_partitions=4, threshold=0.5, k=K)
    assert res["suppressed"] == 2
    final = table_to_arrow(tb)
    ids = set(final["doc_id"].to_pylist())
    assert "spam-exact" not in ids and "spam-near" not in ids
    assert "novel" in ids and "d003" in ids and "d000" not in ids

    q = read_quarantine(tb, 2)
    got = dict(zip(q["doc_id"].to_pylist(), q[MATCH_COLUMN].to_pylist()))
    assert got == {"spam-exact": "d003", "spam-near": "d003"}
    jmap = dict(zip(q["doc_id"].to_pylist(), q[JACCARD_COLUMN].to_pylist()))
    assert jmap["spam-exact"] == pytest.approx(1.0)
    assert jmap["spam-near"] == pytest.approx(
        token_shingle_jaccard(nearby, base, k=K), abs=1e-4)
    # near-dup rejections hold content that exists nowhere else (the twin
    # DIFFERS): the payload rides into quarantine so readmit can recover it
    toks = dict(zip(q["doc_id"].to_pylist(), q["tokens"].to_pylist()))
    assert toks["spam-near"] == nearby


def test_gate_keeps_index_current_across_epochs(gated_table):
    """A doc admitted at epoch 2 must screen epoch 3's near-dup of IT."""
    tb, vd = gated_table
    novel = _tokens(555, n=120)
    e2 = _events([("I", 2, 0, "fresh", list(novel))])
    apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2, e2.schema,
                            num_partitions=4, k=K)
    e3 = _events([("I", 3, 0, "fresh-copy", _near(novel, flips=2, seed=1))])
    res = apply_with_neardup_gate(ray.data.from_arrow(e3), tb, vd, 3, e3.schema,
                                  num_partitions=4, k=K)
    assert res["suppressed"] == 1
    q = read_quarantine(tb, 3)
    assert q[MATCH_COLUMN].to_pylist() == ["fresh"]


def test_gate_retry_is_fenced_and_quarantine_idempotent(gated_table):
    tb, vd = gated_table
    base = _tokens(5, n=120)
    e2 = _events([("I", 2, 0, "dup", list(base)),
                  ("I", 2, 1, "new", _tokens(321, n=120))])
    first = apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2,
                                    e2.schema, num_partitions=4, k=K)
    again = apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2,
                                    e2.schema, num_partitions=4, k=K)
    assert first["suppressed"] == again["suppressed"] == 1
    assert read_quarantine(tb, 2).num_rows == 1  # not doubled
    assert table_to_arrow(tb).num_rows == 21


def test_crashed_attempt_tmp_residue_swept_on_retry(gated_table):
    """A crashed gate attempt leaves ``epoch-EEEEEE.tmp-<uuid>`` behind;
    the next successful attempt (and any fenced retry) sweeps it, and the
    residue never pollutes read_quarantine."""
    import os

    from gamechanger_data_ray.engine.ingest_gate import QUARANTINE_DIR

    tb, vd = gated_table
    qroot = os.path.join(tb, QUARANTINE_DIR)
    orphan = os.path.join(qroot, "epoch-000002.tmp-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"junk from a crashed attempt")
    e2 = _events([("I", 2, 0, "dup", _tokens(5, n=120)),
                  ("I", 2, 1, "new", _tokens(444, n=120))])
    res = apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2,
                                  e2.schema, num_partitions=4, k=K)
    assert res["suppressed"] == 1
    assert not os.path.isdir(orphan)  # swept after commit
    assert read_quarantine(tb, 2).num_rows == 1
    # residue appearing later (crash of a duplicate attempt) goes on the
    # fenced-retry pass too
    os.makedirs(orphan)
    again = apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2,
                                    e2.schema, num_partitions=4, k=K)
    assert again["suppressed"] == 1
    assert not os.path.isdir(orphan)


def test_all_clean_epoch_leaves_no_quarantine_dir(gated_table):
    import os

    from gamechanger_data_ray.engine.ingest_gate import QUARANTINE_DIR

    tb, vd = gated_table
    e2 = _events([("I", 2, 0, "novel", _tokens(999, n=120))])
    res = apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2,
                                  e2.schema, num_partitions=4, k=K)
    assert res["suppressed"] == 0 and res["quarantine_dir"] is None
    assert not os.path.isdir(
        os.path.join(tb, QUARANTINE_DIR, "epoch-000002"))
    assert read_quarantine(tb, 2).num_rows == 0


def test_quarantine_retention_policy_and_expiry(gated_table):
    """Recorded policy → expire keeps the newest N audit dirs; no policy
    → expire is a refuse-to-guess no-op; before_epoch is the explicit
    override; an expired epoch readmits as a clean no-op; re-running
    removes nothing further."""
    from gamechanger_data_ray.engine.ingest_gate import (
        expire_quarantine,
        list_quarantine_epochs,
        quarantine_policy,
        readmit,
        set_quarantine_policy,
    )

    tb, vd = gated_table
    for e in (2, 3, 4):  # one quarantined dup per epoch
        ev = _events([("I", e, 0, f"dup-{e}", _tokens(e - 2, n=120)),
                      ("I", e, 1, f"new-{e}", _tokens(7000 + e, n=120))])
        apply_with_neardup_gate(ray.data.from_arrow(ev), tb, vd, e,
                                ev.schema, num_partitions=4, k=K)
    assert list_quarantine_epochs(tb) == [2, 3, 4]

    # no policy: nothing silently dropped
    assert expire_quarantine(tb) == {"removed": [], "kept": 3,
                                     "reason": "no policy"}
    assert quarantine_policy(tb) is None

    set_quarantine_policy(tb, 1)
    assert quarantine_policy(tb) == {"keep_epochs": 1}
    out = expire_quarantine(tb)  # defaults from the recorded policy
    assert out["removed"] == [2, 3] and out["kept"] == 1
    assert list_quarantine_epochs(tb) == [4]
    assert read_quarantine(tb, 2).num_rows == 0
    assert readmit(tb, 2) == {"epoch": None, "readmitted": 0}
    assert expire_quarantine(tb) == {"removed": [], "kept": 1}  # idempotent

    # explicit cutoff beats the policy; clearing the policy restores
    # keep-everything
    assert expire_quarantine(tb, before_epoch=4) == {"removed": [],
                                                     "kept": 1}
    set_quarantine_policy(tb, 0)
    assert quarantine_policy(tb) is None
    assert expire_quarantine(tb)["removed"] == []


def test_autopilot_plans_quarantine_expiry_only_with_policy(gated_table):
    from gamechanger_data_ray.engine import autopilot
    from gamechanger_data_ray.engine.ingest_gate import (
        list_quarantine_epochs,
        set_quarantine_policy,
    )

    tb, vd = gated_table
    for e in (2, 3):
        ev = _events([("I", e, 0, f"dup-{e}", _tokens(e - 2, n=120))])
        apply_with_neardup_gate(ray.data.from_arrow(ev), tb, vd, e,
                                ev.schema, num_partitions=4, k=K)
    ops = [a["op"] for a in autopilot.plan(tb)]
    assert "expire-quarantine" not in ops  # opt-in

    set_quarantine_policy(tb, 1)
    plan = autopilot.plan(tb)
    acts = [a for a in plan if a["op"] == "expire-quarantine"]
    assert len(acts) == 1 and acts[0]["keep_epochs"] == 1
    report = autopilot.apply(tb, plan)
    row = next(r for r in report if r["op"] == "expire-quarantine")
    assert row["removed"] == 1 and row["kept"] == 1
    assert list_quarantine_epochs(tb) == [3]
    assert not [a for a in autopilot.plan(tb)
                if a["op"] == "expire-quarantine"]  # converged


def test_screen_passthrough_on_fresh_table(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([("I", 1, 0, "a", _tokens(1)), ("I", 1, 1, "b", _tokens(2))])
    out = screen_events(ray.data.from_arrow(e1), tb, vd).to_pandas()
    assert out[MATCH_COLUMN].isna().all() and out[JACCARD_COLUMN].isna().all()
    res = apply_with_neardup_gate(ray.data.from_arrow(e1), tb, vd, 1,
                                  e1.schema, num_partitions=4, k=K)
    assert res["suppressed"] == 0 and res["quarantine_dir"] is None
    assert table_to_arrow(tb).num_rows == 2


def test_gate_guards_signature_and_staleness(gated_table):
    tb, vd = gated_table
    e2 = _events([("I", 2, 0, "x", _tokens(9))])
    with pytest.raises(ValueError, match="signature mismatch"):
        screen_events(ray.data.from_arrow(e2), tb, vd, k=K + 2)
    # commit an epoch WITHOUT refreshing → stale index refuses
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema,
                         num_partitions=4)
    with pytest.raises(ValueError, match="stale"):
        screen_events(ray.data.from_arrow(e2), tb, vd, k=K)


def test_gate_candidate_cap_bounds_verify(gated_table):
    """max_candidates=1 still finds A near-dup (results become a lower
    bound, never quadratic work)."""
    tb, vd = gated_table
    base = _tokens(3, n=120)
    e2 = _events([("I", 2, 0, "flood", list(base))])
    res = apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2,
                                  e2.schema, num_partitions=4, k=K,
                                  max_candidates=1)
    assert res["suppressed"] == 1


def _write_epoch(cl_dir, epoch, table):
    """Craft one ready changelog epoch in the standard layout."""
    import json
    import os

    import pyarrow.parquet as pq

    from gamechanger_data_ray.core.changelog import READY_MARKER, epoch_dir

    d = epoch_dir(cl_dir, epoch)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-00000.parquet"))
    with open(os.path.join(d, READY_MARKER), "w") as f:
        json.dump({"epoch": epoch, "files": ["part-00000.parquet"],
                   "events": table.num_rows}, f)


def test_replay_gated_walks_epochs_and_cli(tmp_path):
    """replay_gated: epoch 1 bootstraps (passthrough), epoch 2's dup of an
    epoch-1 doc is suppressed — the per-epoch index refresh is what makes
    that possible; CLI verb prints the same result and is resumable."""
    import json

    from gamechanger_data_ray.__main__ import main
    from gamechanger_data_ray.engine.ingest_gate import replay_gated

    cl_dir, tb, vd = (str(tmp_path / "cl"), str(tmp_path / "tb"),
                      str(tmp_path / "idx"))
    base = _tokens(11, n=120)
    _write_epoch(cl_dir, 1, _events(
        [("I", 1, i, f"d{i:03d}", _tokens(i, n=120)) for i in range(10)]
        + [("I", 1, 10, "orig", list(base))]))
    _write_epoch(cl_dir, 2, _events(
        [("I", 2, 0, "copycat", _near(base, flips=3, seed=2)),
         ("I", 2, 1, "novel", _tokens(777, n=120))]))

    out = replay_gated(cl_dir, tb, vd, num_partitions=4, k=K)
    assert out["applied_epochs"] == [1, 2] and out["epoch"] == 2
    assert out["suppressed"] == 1
    ids = set(table_to_arrow(tb)["doc_id"].to_pylist())
    assert "orig" in ids and "novel" in ids and "copycat" not in ids
    assert read_quarantine(tb, 2)[MATCH_COLUMN].to_pylist() == ["orig"]

    # rerun = fenced no-op; a new epoch resumes from the checkpoint
    assert replay_gated(cl_dir, tb, vd, num_partitions=4, k=K)[
        "applied_epochs"] == []
    _write_epoch(cl_dir, 3, _events(
        [("I", 3, 0, "copycat2", _near(base, flips=2, seed=3))]))
    assert main(["replay-gated", "--changelog", cl_dir, "--table", tb,
                 "--view", vd, "--partitions", "4"]) == 0
    assert read_quarantine(tb, 3)[MATCH_COLUMN].to_pylist() == ["orig"]
