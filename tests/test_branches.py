"""Write-audit-publish branches (engine/branches.py).

Invariants: fork copies zero data files and leaves the parent untouched;
the full engine toolbox (replay, merge-on-read, validate, checksum)
works on a branch unchanged; publish is a fenced fast-forward whose
result is byte-identical in logical state to a never-branched replay,
with per-epoch lineage preserved; a moved parent refuses publish;
discard leaves no trace; vacuum never eats an open branch's files.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.branches import (
    branch_create,
    branch_discard,
    branch_path,
    branch_publish,
    list_branches,
)
from gamechanger_data_ray.engine.cdc import replay, table_to_arrow
from gamechanger_data_ray.engine.maintenance import (
    table_checksums,
    vacuum,
    validate_table,
)
from gamechanger_data_ray.state import manifest as mf

P = 4


def _mk(tmp_path, epochs=3, events=600, keys=200, seed=11):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=epochs, events_per_epoch=events,
                    num_keys=keys, seed=seed, evolution=True)
    return cd, td


def _branch_parquets(bdir):
    return glob.glob(os.path.join(bdir, "part=*", "*.parquet"))


def test_fork_is_zero_copy_and_readable(tmp_path):
    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2)
    before = table_to_arrow(td)
    info = branch_create(td, "audit")
    bdir = info["path"]
    assert _branch_parquets(bdir) == []          # no data copied
    got = table_to_arrow(bdir)                   # reads parent files
    assert got.sort_by("doc_id").equals(before.sort_by("doc_id"))
    assert mf.load_current(td).epoch == 2        # parent untouched
    assert list_branches(td) == {
        "audit": {"forked_at": [2, 0], "head": [2, 0], "staged_epochs": 0}}
    with pytest.raises(FileExistsError):
        branch_create(td, "audit")
    with pytest.raises(ValueError, match="bad branch name"):
        branch_create(td, "../evil")


def test_wap_lifecycle_matches_never_branched_replay(tmp_path):
    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2, epochs_per_commit=1)
    branch_create(td, "wap")
    bdir = branch_path(td, "wap")

    # stage epoch 3 on the branch; parent must not see it
    m = replay(cd, bdir, num_partitions=P)
    assert m.epoch == 3
    assert mf.load_current(td).epoch == 2
    assert list_branches(td)["wap"]["staged_epochs"] == 1

    # audit with the standard toolbox, on the branch
    assert validate_table(bdir)["violations"] == {}
    staged_digest = table_checksums(bdir)["digest"]

    out = branch_publish(td, "wap")
    assert out == {"published_epochs": 1, "epoch": 3, "rev": 0}
    cur = mf.load_current(td)
    assert cur.epoch == 3
    assert cur.epoch_counters["published_from_branch"] == "wap"
    assert table_checksums(td)["digest"] == staged_digest

    # logical state == a replay that never branched
    ref = str(tmp_path / "ref")
    replay(cd, ref, num_partitions=P)
    assert table_to_arrow(td).sort_by("doc_id").equals(
        table_to_arrow(ref).sort_by("doc_id"))
    assert validate_table(td)["violations"] == {}
    # branch is closed; its data files remain (the parent references them)
    assert "wap" not in list_branches(td)
    assert any("_branches/wap" in e.get("file", "")
               for e in cur.partitions.values())


def test_publish_refuses_non_fast_forward(tmp_path):
    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=1)
    branch_create(td, "stale")
    bdir = branch_path(td, "stale")
    replay(cd, bdir, num_partitions=P, up_to_epoch=2)  # stage epoch 2
    replay(cd, td, num_partitions=P, up_to_epoch=2)    # parent moves too
    with pytest.raises(RuntimeError, match="non-fast-forward"):
        branch_publish(td, "stale")
    # the doomed branch discards cleanly
    out = branch_discard(td, "stale")
    assert out["discarded"] == "stale" and out["data_files_deleted"] > 0
    assert not os.path.exists(bdir)
    with pytest.raises(FileNotFoundError):
        branch_discard(td, "stale")
    with pytest.raises(FileNotFoundError):
        branch_publish(td, "stale")


def test_noop_publish_closes_branch(tmp_path):
    cd, td = _mk(tmp_path, epochs=1)
    replay(cd, td, num_partitions=P)
    branch_create(td, "idle")
    out = branch_publish(td, "idle")
    assert out["published_epochs"] == 0
    assert "idle" not in list_branches(td)
    assert not os.path.exists(branch_path(td, "idle"))  # wrote nothing


def test_vacuum_protects_open_branch(tmp_path):
    cd, td = _mk(tmp_path, epochs=4)
    replay(cd, td, num_partitions=P, up_to_epoch=2, epochs_per_commit=1)
    branch_create(td, "keepme")
    bdir = branch_path(td, "keepme")
    replay(cd, bdir, num_partitions=P, up_to_epoch=3)
    staged = table_to_arrow(bdir)
    # parent advances (dooming the branch) and vacuums hard
    replay(cd, td, num_partitions=P, epochs_per_commit=1)
    vacuum(td, keep_epochs=1)
    # the branch still reads: its own files AND the fork-point parent
    # files it references survived the sweep
    assert table_to_arrow(bdir).sort_by("doc_id").equals(
        staged.sort_by("doc_id"))


def test_merge_on_read_branch_publishes(tmp_path):
    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2)
    branch_create(td, "mor")
    bdir = branch_path(td, "mor")
    replay(cd, bdir, num_partitions=P, merge_policy="delta")
    branch_publish(td, "mor")
    cur = mf.load_current(td)
    assert any(e.get("deltas") for e in cur.partitions.values())
    ref = str(tmp_path / "ref")
    replay(cd, ref, num_partitions=P)
    assert table_to_arrow(td).sort_by("doc_id").equals(
        table_to_arrow(ref).sort_by("doc_id"))


def test_sequential_branches_reframe_residue(tmp_path):
    """Branch b forks AFTER branch a published: b inherits a's
    _branches/a/... files by absolute path and publish maps them back."""
    cd, td = _mk(tmp_path, epochs=4, events=400)
    replay(cd, td, num_partitions=P, up_to_epoch=2)
    branch_create(td, "a")
    replay(cd, branch_path(td, "a"), num_partitions=P, up_to_epoch=3)
    branch_publish(td, "a")
    branch_create(td, "b")
    replay(cd, branch_path(td, "b"), num_partitions=P)
    branch_publish(td, "b")
    cur = mf.load_current(td)
    assert cur.epoch == 4
    for e in cur.partitions.values():
        assert e.get("file") and not os.path.isabs(e["file"])
    ref = str(tmp_path / "ref")
    replay(cd, ref, num_partitions=P)
    assert table_to_arrow(td).sort_by("doc_id").equals(
        table_to_arrow(ref).sort_by("doc_id"))
    assert validate_table(td)["violations"] == {}


def test_rewrite_migrates_published_residue_out(tmp_path):
    """The self-healing story: after publish, the next physical rewrite
    of a partition lands in the parent tree, and vacuum sweeps the
    _branches residue file."""
    from gamechanger_data_ray.engine.maintenance import cluster_table

    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2)
    branch_create(td, "w")
    replay(cd, branch_path(td, "w"), num_partitions=P)
    branch_publish(td, "w")
    residue = [f for f in mf.load_current(td).data_files(td)
               if "_branches" in f]
    assert residue
    assert cluster_table(td, by="n_tok") is not None  # rewrites all parts
    cur = mf.load_current(td)
    assert not any("_branches" in (e.get("file") or "")
                   for e in cur.partitions.values())
    vacuum(td, keep_epochs=1)
    assert not any(os.path.exists(f) for f in residue)


def test_publish_require_clean_audit_gate(tmp_path):
    """--require-clean: a staged state that fails validate_table cannot
    publish; a clean one publishes with the same flag."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2)
    branch_create(td, "dirty")
    bdir = branch_path(td, "dirty")
    replay(cd, bdir, num_partitions=P)
    # corrupt one BRANCH-LOCAL staged file: n_tok no longer len(tokens)
    cur = mf.load_current(bdir)
    local = next(e["file"] for e in cur.partitions.values()
                 if e.get("file") and not os.path.isabs(e["file"]))
    path = os.path.join(bdir, local)
    t = pq.read_table(path)
    bad = t.set_column(t.schema.get_field_index("n_tok"), "n_tok",
                       pc.add(t["n_tok"], 1))
    pq.write_table(bad, path)
    with pytest.raises(RuntimeError, match="failed the publish audit"):
        branch_publish(td, "dirty", require_clean=True)
    assert mf.load_current(td).epoch == 2      # nothing published
    branch_discard(td, "dirty")

    branch_create(td, "clean")
    replay(cd, branch_path(td, "clean"), num_partitions=P)
    out = branch_publish(td, "clean", require_clean=True)
    assert out["published_epochs"] == 1
    assert mf.load_current(td).epoch == 3


def test_export_import_roundtrips_published_residue(tmp_path):
    """A published table whose manifest references _branches/<name>/...
    files must export/import as a working bundle (rels preserved)."""
    from gamechanger_data_ray.engine.maintenance import export_table, import_table

    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2)
    branch_create(td, "x")
    replay(cd, branch_path(td, "x"), num_partitions=P)
    branch_publish(td, "x")
    want = table_to_arrow(td).sort_by("doc_id")
    bundle, td2 = str(tmp_path / "bundle"), str(tmp_path / "tb2")
    export_table(td, bundle)
    import_table(bundle, td2)
    assert table_to_arrow(td2).sort_by("doc_id").equals(want)
    assert table_checksums(td2)["digest"] == table_checksums(td)["digest"]


def test_publish_crash_sweep(tmp_path, monkeypatch):
    """Kill publish at every write it performs; the parent must stay at
    the fork point through every crash, and a plain retry must complete
    to the exact state an uncrashed publish produces."""
    from gamechanger_data_ray.state.fs import StorageAdapter

    cd, td = _mk(tmp_path, epochs=4)
    replay(cd, td, num_partitions=P, up_to_epoch=1, epochs_per_commit=1)
    branch_create(td, "c")
    bdir = branch_path(td, "c")
    # 3 staged epochs -> >=3 manifest writes + the _CURRENT swap inside
    # commit: several distinct crash points
    replay(cd, bdir, num_partitions=P, epochs_per_commit=1)
    want = table_to_arrow(bdir).sort_by("doc_id")

    real = StorageAdapter.atomic_write_text
    crash_point = 0
    while True:
        calls = {"n": 0}

        def boom(self, path, text, _cp=crash_point, _calls=calls):
            if _calls["n"] == _cp:
                raise OSError(f"injected crash at write {_cp}")
            _calls["n"] += 1
            return real(self, path, text)

        monkeypatch.setattr(StorageAdapter, "atomic_write_text", boom)
        try:
            branch_publish(td, "c")
            monkeypatch.setattr(StorageAdapter, "atomic_write_text", real)
            break  # crash point beyond the last write: publish succeeded
        except OSError:
            monkeypatch.setattr(StorageAdapter, "atomic_write_text", real)
            # crashed mid-publish: parent must still be at the fork point
            cur = mf.load_current(td)
            assert (cur.epoch, cur.rev) == (1, 0), (
                f"crash point {crash_point} moved the parent to "
                f"{(cur.epoch, cur.rev)}")
            assert "c" in list_branches(td)  # branch still open for retry
        crash_point += 1
        assert crash_point < 20, "runaway crash sweep"
    assert crash_point >= 3  # the sweep actually exercised interior points
    cur = mf.load_current(td)
    assert cur.epoch == 4
    assert table_to_arrow(td).sort_by("doc_id").equals(want)
    assert validate_table(td)["violations"] == {}


def test_branch_diff_previews_publish(tmp_path):
    """branch_diff == the change rows a never-branched table's own
    epoch-to-epoch diff produces for the same epochs (and empty for a
    fresh fork)."""
    import pyarrow as pa

    from gamechanger_data_ray.core.diff import CHANGE_COLUMN
    from gamechanger_data_ray.engine.branches import branch_diff
    from gamechanger_data_ray.engine.diff import diff_table_epochs

    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2, epochs_per_commit=1)
    branch_create(td, "d")
    assert branch_diff(td, "d").count() == 0  # nothing staged yet
    replay(cd, branch_path(td, "d"), num_partitions=P)

    def gather(ds):
        t = pa.concat_tables(
            [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
        return t.sort_by([("doc_id", "ascending"), (CHANGE_COLUMN, "ascending")])

    got = gather(branch_diff(td, "d"))
    ref = str(tmp_path / "ref")
    replay(cd, ref, num_partitions=P, epochs_per_commit=1)
    want = gather(diff_table_epochs(ref, 2, 3))
    assert got.num_rows == want.num_rows > 0
    assert got.cast(want.schema).equals(want)
    with pytest.raises(FileNotFoundError):
        branch_diff(td, "nope")


def test_rebase_recovers_non_fast_forward(tmp_path):
    """Parent moves under an open branch; rebase re-forks and re-applies
    the branch's net change unioned with the parent's, conflicts
    resolving by LWW on lineage: a NEWER parent write survives the
    rebase; a parent delete of a key the branch never touched stays
    deleted; a parent delete of a key the branch UPDATED loses to the
    update (update-beats-concurrent-delete — delete lineage floors at
    the deleted row after tombstone compaction, the documented
    reverse-CDC limit); disjoint changes merge."""
    import pyarrow as pa

    from gamechanger_data_ray.core.diff import CHANGE_COLUMN
    from gamechanger_data_ray.engine.branches import branch_diff, branch_rebase
    from gamechanger_data_ray.engine.cdc import apply_events_dataset

    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2)
    branch_create(td, "r")
    bdir = branch_path(td, "r")
    replay(cd, bdir, num_partitions=P)  # stage epoch 3
    staged = table_to_arrow(bdir)

    # keys the branch's net change actually touches (alive post-stage)
    net = pa.concat_tables([pa.table(b) for b in branch_diff(td, "r")
                           .iter_batches(batch_format="pyarrow")])
    alive = set(staged["doc_id"].to_pylist())
    changed = [k for k, c in zip(net["doc_id"].to_pylist(),
                                 net[CHANGE_COLUMN].to_pylist())
               if c != "delete" and k in alive]
    assert len(changed) >= 2, "test premise: branch changed >= 2 live keys"
    k_up, k_del = sorted(changed)[:2]
    untouched = sorted(alive - set(net["doc_id"].to_pylist()))
    assert untouched, "test premise: a live key the branch never changed"
    k_gone = untouched[0]

    # parent adopts CONFLICTING writes at much higher lsn + a fresh key
    hi = 10**9
    ev = pa.table({
        "op": pa.array(["U", "D", "D", "I"]),
        "lsn": pa.array([hi] * 4, pa.int64()),
        "seq": pa.array([1, 2, 3, 4], pa.int64()),
        "version_hash": pa.array(["p1", "p2", "p3", "p4"]),
        "doc_id": pa.array([k_up, k_del, k_gone, "zz-parent-new"]),
        "tokens": pa.array([[9, 9, 9], None, None, [7]], pa.list_(pa.int32())),
        "n_tok": pa.array([3, None, None, 1], pa.int32()),
        "source": pa.array(["hotfix", None, None, "hotfix"]),
    })
    import ray.data
    apply_events_dataset(ray.data.from_arrow(ev), td, epoch=3,
                         incoming_schema=ev.schema, num_partitions=P)
    with pytest.raises(RuntimeError, match="non-fast-forward"):
        branch_publish(td, "r")

    out = branch_rebase(td, "r")
    assert out["rebased"] and out["new_base"] == [3, 0]
    assert out["replayed_changes"] == net.num_rows
    assert branch_publish(td, "r")["epoch"] == 4

    final = table_to_arrow(td)
    rows = {r["doc_id"]: r for r in final.to_pylist()}
    assert rows[k_up]["tokens"] == [9, 9, 9]          # parent's write won
    assert rows[k_up]["source"] == "hotfix"
    assert k_gone not in rows                         # untouched-key delete holds
    assert rows["zz-parent-new"]["tokens"] == [7]     # disjoint parent add
    # delete-vs-update conflict: the branch's post-fork update is newer
    # than the row the parent deleted, so it resurrects (pinned semantics)
    staged_rows = {r["doc_id"]: r for r in staged.to_pylist()}
    assert rows[k_del]["tokens"] == staged_rows[k_del]["tokens"]
    # every OTHER branch change landed verbatim
    for k, r in staged_rows.items():
        if k in (k_up, k_gone):
            continue
        assert rows[k]["tokens"] == r["tokens"], k
        assert rows[k]["n_tok"] == r["n_tok"], k
    assert validate_table(td)["violations"] == {}


def test_rebase_noop_and_guards(tmp_path, capsys):
    from gamechanger_data_ray.__main__ import main
    from gamechanger_data_ray.engine.branches import branch_rebase

    cd, td = _mk(tmp_path, epochs=2)
    replay(cd, td, num_partitions=P, up_to_epoch=1)
    with pytest.raises(FileNotFoundError):
        branch_rebase(td, "ghost")
    branch_create(td, "n")
    out = branch_rebase(td, "n")
    assert out["rebased"] is False  # parent never moved
    # parent moves; branch staged NOTHING -> rebase is a fresh re-fork
    replay(cd, td, num_partitions=P)
    assert main(["rebase-branch", "--table", td, "--name", "n"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebased"] is True and out["replayed_changes"] == 0
    assert list_branches(td)["n"]["forked_at"] == [2, 0]
    assert branch_publish(td, "n")["published_epochs"] == 0


def test_rebase_refusals(tmp_path):
    """The two honest refusals: coalesce tables (full-image re-apply
    would clobber column history) and a vacuumed fork-point manifest
    (the parent's conflict set is unrecoverable)."""
    from gamechanger_data_ray.engine.branches import branch_rebase
    from gamechanger_data_ray.engine.maintenance import vacuum

    # coalesce table
    cd, td = str(tmp_path / "ccl"), str(tmp_path / "ctb")
    write_changelog(cd, num_epochs=2, events_per_epoch=200, num_keys=80,
                    partial_frac=0.5)
    replay(cd, td, num_partitions=P, up_to_epoch=1, update_mode="coalesce")
    branch_create(td, "c")
    replay(cd, branch_path(td, "c"), num_partitions=P,
           update_mode="coalesce")
    with pytest.raises(ValueError, match="coalesce"):
        branch_rebase(td, "c")

    # vacuumed fork point
    cd2, td2 = _mk(tmp_path, epochs=4)
    replay(cd2, td2, num_partitions=P, up_to_epoch=2, epochs_per_commit=1)
    branch_create(td2, "v")
    replay(cd2, branch_path(td2, "v"), num_partitions=P, up_to_epoch=3)
    replay(cd2, td2, num_partitions=P, epochs_per_commit=1)  # parent -> 4
    vacuum(td2, keep_epochs=1)  # evicts the epoch-2 fork manifest
    with pytest.raises(RuntimeError, match="unrecoverable"):
        branch_rebase(td2, "v")
    branch_discard(td2, "v")


def test_schema_drop_staged_on_branch(tmp_path):
    """Schema evolution composes with staging: drop a column ON the
    branch, audit, publish — the parent adopts the narrowed schema AND
    the anti-resurrection tombstone in one atomic swap."""
    from gamechanger_data_ray.engine.maintenance import drop_column

    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P)  # epochs 1-3; lang present
    assert "lang" in mf.load_current(td).schema.names
    branch_create(td, "narrow")
    bdir = branch_path(td, "narrow")
    drop_column(bdir, "lang")
    assert "lang" not in mf.load_current(bdir).schema.names
    assert "lang" in mf.load_current(td).schema.names  # parent unaffected
    out = branch_publish(td, "narrow")
    assert out["published_epochs"] == 1  # the same-epoch drop revision
    cur = mf.load_current(td)
    assert "lang" not in cur.schema.names
    assert cur.dropped_columns == ["lang"]
    assert "lang" not in table_to_arrow(td).schema.names


def test_gated_replay_onto_branch_cli(tmp_path, capsys):
    """The screened-AND-staged combo: replay-gated --branch quality-
    screens each staged epoch, quarantine lands in the branch dir, and
    publish adopts only the admitted rows."""
    import glob as _glob

    import pyarrow.parquet as pq

    from gamechanger_data_ray.__main__ import main

    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=1)  # ungated base
    lsn1 = max(
        int(pq.read_table(f, columns=["lsn"])["lsn"].to_numpy().max())
        for f in _glob.glob(os.path.join(cd, "epoch=000001", "*.parquet")))
    branch_create(td, "g")
    min_tok = 60
    assert main(["replay-gated", "--changelog", cd, "--table", td,
                 "--branch", "g", "--mode", "quality",
                 "--min-tok", str(min_tok), "--partitions", str(P)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied_epochs"] == [2, 3] and out["suppressed"] > 0
    bdir = branch_path(td, "g")
    assert os.path.isdir(os.path.join(bdir, "_quarantine"))
    assert mf.load_current(td).epoch == 1  # gate staged, parent untouched
    branch_publish(td, "g")
    final = table_to_arrow(td)
    # every under-min_tok row in the published state predates the gate
    for r in final.to_pylist():
        if r["n_tok"] is not None and r["n_tok"] < min_tok:
            assert r["lsn"] <= lsn1, (r["doc_id"], r["lsn"])
    assert any(r["n_tok"] is not None and r["n_tok"] >= min_tok
               for r in final.to_pylist())


def test_branch_cli(tmp_path, capsys):
    from gamechanger_data_ray.__main__ import main

    cd, td = _mk(tmp_path)
    replay(cd, td, num_partitions=P, up_to_epoch=2)

    def last_json():
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert main(["branch", "--table", td, "--create", "cli"]) == 0
    assert last_json()["branch"] == "cli"
    assert main(["replay", "--changelog", cd, "--table", td,
                 "--partitions", str(P), "--branch", "cli"]) == 0
    assert last_json()["epoch"] == 3
    assert main(["branch", "--table", td, "--list"]) == 0
    assert last_json()["branches"]["cli"]["staged_epochs"] == 1
    assert main(["branch-diff", "--table", td, "--name", "cli"]) == 0
    changes = last_json()["changes"]
    assert changes and all(k in ("insert", "update", "delete") for k in changes)
    assert main(["status", "--table", td]) == 0
    assert last_json()["branches"]["cli"]["staged_epochs"] == 1
    assert main(["publish-branch", "--table", td, "--name", "cli"]) == 0
    out = last_json()
    assert out["published_epochs"] == 1 and out["epoch"] == 3
    with pytest.raises(SystemExit):
        main(["replay", "--changelog", cd, "--table", td,
              "--branch", "never-created"])
