"""Sort-clustered rewrite (maintenance.cluster_table).

Invariants: clustering is a physical rewrite of IDENTICAL logical state
(same-epoch revision, checksums unchanged, validate clean), it folds any
pending merge-on-read deltas, and it makes parquet row-group statistics
on the cluster column disjoint so a pushed-down predicate skips row
groups a key-sorted file could not."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import read_keys, read_table, replay, table_to_arrow
from gamechanger_data_ray.engine.maintenance import (
    cluster_table,
    table_checksums,
    validate_table,
)
from gamechanger_data_ray.state import manifest as mf

ROW_GROUP = 64


@pytest.fixture(scope="module")
def clustered(tmp_path_factory):
    """A merge-on-read table (so clustering also exercises delta folding),
    its pre-cluster checksums/row-group profile, then clustered by n_tok."""
    root = tmp_path_factory.mktemp("cluster")
    cd, td = str(root / "cl"), str(root / "t")
    write_changelog(cd, num_epochs=3, events_per_epoch=3000, num_keys=1500,
                    seed=21, evolution=True, dup_frac=0.05)
    replay(cd, td, num_partitions=4, epochs_per_commit=1, merge_policy="delta")
    before = {
        "checksums": table_checksums(td),
        "arrow": table_to_arrow(td),
        "manifest": mf.load_current(td),
    }
    m = cluster_table(td, by="n_tok", row_group_rows=ROW_GROUP)
    assert m is not None
    return td, before, m


def test_cluster_commits_same_epoch_revision(clustered):
    td, before, m = clustered
    assert m.epoch == before["manifest"].epoch
    assert m.rev == before["manifest"].rev + 1
    assert m.epoch_counters["clustered_by"] == "n_tok"


def test_cluster_preserves_logical_state(clustered):
    td, before, _ = clustered
    after = table_checksums(td)
    assert after["digest"] == before["checksums"]["digest"]
    assert after["rows"] == before["checksums"]["rows"]
    a = table_to_arrow(td)
    assert a.equals(before["arrow"])


def test_cluster_folds_deltas_and_validates(clustered):
    td, _, m = clustered
    assert not any(e.get("deltas") for e in m.partitions.values())
    rep = validate_table(td)
    assert rep["violations"] == {}, rep


def test_cluster_rows_are_ordered_by_cluster_key(clustered):
    td, _, m = clustered
    for p, e in m.partitions.items():
        t = pq.read_table(os.path.join(td, e["file"]), columns=["n_tok"])
        if t.num_rows < 2:
            continue
        vals = t["n_tok"].to_pylist()
        assert vals == sorted(vals), f"partition {p} not n_tok-ordered"


def test_row_group_stats_prune_on_cluster_column(clustered):
    """The point of clustering: a narrow n_tok bound overlaps only a
    fraction of row groups in the clustered file (key-sorted files leave
    every group's n_tok range wide)."""
    td, _, m = clustered
    biggest = max(m.partitions.values(), key=lambda e: e["rows"])
    pf = pq.ParquetFile(os.path.join(td, biggest["file"]))
    assert pf.num_row_groups >= 4, "row_group_rows did not split the file"
    # locate the parquet LEAF by path (the Arrow field index only matches
    # the leaf index while every column is a single-leaf primitive)
    sch = pf.metadata.schema
    leaf = [sch.column(j).path for j in range(len(sch))].index("n_tok")
    ci = [pf.metadata.row_group(i).column(leaf) for i in range(pf.num_row_groups)]
    lo, hi = ci[0].statistics.min, ci[0].statistics.max  # first group's range
    overlapping = sum(
        1 for c in ci
        if not (c.statistics.max < lo or c.statistics.min > hi))
    assert overlapping <= max(2, pf.num_row_groups // 2), (
        f"{overlapping}/{pf.num_row_groups} row groups overlap a "
        "one-group n_tok range — clustering is not selective")


def test_bounded_read_equivalent_after_cluster(clustered):
    td, before, _ = clustered
    full = before["arrow"]
    med = sorted(full["n_tok"].to_pylist())[full.num_rows // 2]
    expect = full.filter(pc.field("n_tok") <= med)
    got = read_table(td, bounds={"n_tok": (None, med)}).take_all()
    assert len(got) == expect.num_rows
    assert sorted(r["doc_id"] for r in got) == sorted(
        expect["doc_id"].to_pylist())


def test_point_lookup_after_cluster(clustered):
    td, before, _ = clustered
    full = before["arrow"]
    keys = full["doc_id"].to_pylist()[:5] + ["nope-missing-key"]
    t = read_keys(td, keys)
    assert t.num_rows == 5
    assert set(t["doc_id"].to_pylist()) == set(keys[:5])


def test_cluster_rejects_bad_columns(clustered):
    td, _, _ = clustered
    with pytest.raises(ValueError, match="not in table schema"):
        cluster_table(td, by="no_such_col")
    with pytest.raises(ValueError, match="nested"):
        cluster_table(td, by="tokens")
    with pytest.raises(ValueError, match="at least one"):
        cluster_table(td, by=[])


def test_next_epoch_after_cluster_stays_correct(tmp_path):
    """Writes after clustering re-merge cleanly (touched partitions go
    back to key order; state stays exact)."""
    cd, td = str(tmp_path / "cl"), str(tmp_path / "t")
    write_changelog(cd, num_epochs=3, events_per_epoch=800, num_keys=300, seed=5)
    replay(cd, td, num_partitions=4, up_to_epoch=2)
    assert cluster_table(td, by="n_tok", row_group_rows=ROW_GROUP) is not None
    replay(cd, td, num_partitions=4)  # applies epoch 3 on clustered bases
    ref = str(tmp_path / "ref")
    replay(cd, ref, num_partitions=4)  # same changelog, never clustered
    assert table_to_arrow(td).equals(table_to_arrow(ref))
    assert validate_table(td)["violations"] == {}
