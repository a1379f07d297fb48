"""Hash-routed point lookup + predicate-pushdown reads.

The lookup must read ONLY the partitions the requested keys hash to
(O(|keys|) files, not a table scan) and return exactly the alive rows a
full-scan filter would — the Ray-Data analog of the reference's
fetch-doc-by-id path."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import (
    read_keys,
    read_table,
    replay,
    routed_partition_files,
    table_to_arrow,
)


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    root = tmp_path_factory.mktemp("lookup")
    cd, td = str(root / "cl"), str(root / "tb")
    write_changelog(cd, num_epochs=2, events_per_epoch=400, num_keys=120, seed=3)
    replay(cd, td, num_partitions=8)
    return td


def _alive(t: pa.Table) -> pa.Table:
    if "op" in t.column_names:
        t = t.filter(pc.field("op") != "D")
    return t


def test_lookup_routes_to_few_partitions(table):
    full = _alive(table_to_arrow(table))
    keys = full["doc_id"].to_pylist()[:3]
    files = routed_partition_files(table, keys)
    assert 1 <= len(files) <= len(keys) < 8


def test_lookup_matches_full_scan_filter(table):
    full = _alive(table_to_arrow(table))
    all_keys = full["doc_id"].to_pylist()
    keys = all_keys[::7][:10]
    got = read_keys(table, keys)
    want = _alive(full.filter(pc.field("doc_id").isin(keys)))
    want = want.take(pc.sort_indices(want, sort_keys=[("doc_id", "ascending")]))
    assert got.select(["doc_id", "tokens", "n_tok"]).equals(
        want.select(["doc_id", "tokens", "n_tok"])
    )


def test_lookup_missing_keys_empty(table):
    got = read_keys(table, ["no-such-doc-a", "no-such-doc-b"])
    assert got.num_rows == 0
    # schema still conforms to the table schema
    assert "doc_id" in got.column_names and "tokens" in got.column_names


def test_lookup_after_delete_finds_nothing(table, tmp_path):
    """Deletes compact on write: a deleted key is absent from the lookup,
    and the zone maps of the rewritten partitions reflect the removal."""
    import shutil

    import ray

    from gamechanger_data_ray.engine.cdc import apply_events_dataset
    from gamechanger_data_ray.state.manifest import committed_epoch

    td = str(tmp_path / "tb")
    shutil.copytree(table, td)
    full = _alive(table_to_arrow(td))
    dead = full["doc_id"].to_pylist()[:3]
    assert read_keys(td, dead).num_rows == len(dead)  # present before
    ev = pa.table({
        "op": ["D"] * 3,
        "lsn": pa.array([10**9] * 3, pa.int64()),
        "seq": pa.array([0, 1, 2], pa.int64()),
        "doc_id": dead,
    })
    m = apply_events_dataset(
        ray.data.from_arrow(ev), td, committed_epoch(td) + 1, ev.schema,
        num_partitions=8)
    assert m is not None and m.epoch_counters["tombstones"] >= 3
    assert read_keys(td, dead).num_rows == 0


def test_manifest_zone_maps_written(table):
    from gamechanger_data_ray.state import manifest as mf

    cur = mf.load_current(table)
    assert cur is not None
    for p in cur.partitions.values():
        assert "key_min" in p and "key_max" in p
        assert p["key_min"] <= p["key_max"]


def test_read_table_predicate_pushdown(table):
    import pyarrow.dataset as pads

    full = table_to_arrow(table)
    cutoff = int(pc.approximate_median(full["n_tok"]).as_py())
    got = read_table(table, predicate=pads.field("n_tok") >= cutoff).take_all()
    want = full.filter(pc.field("n_tok") >= cutoff)
    assert len(got) == want.num_rows


def test_projection_across_schema_generations(tmp_path):
    """Column projection over a table whose partition files span a schema
    evolution: untouched partitions carry pre-evolution files (no `lang`
    column) while touched ones are post-evolution — the projected read
    groups files by generation and null-fills the missing column."""
    import ray

    from gamechanger_data_ray.engine.cdc import apply_events_dataset

    td = str(tmp_path / "tb")
    e1 = pa.table({
        "op": ["I"] * 8,
        "lsn": pa.array([1] * 8, pa.int64()),
        "seq": pa.array(range(8), pa.int64()),
        "doc_id": [f"k{i}" for i in range(8)],
        "n_tok": pa.array([10 + i for i in range(8)], pa.int32()),
    })
    apply_events_dataset(ray.data.from_arrow(e1), td, 1, e1.schema, num_partitions=4)
    # epoch 2 touches ONE key and adds the `lang` column
    e2 = pa.table({
        "op": ["U"],
        "lsn": pa.array([2], pa.int64()),
        "seq": pa.array([0], pa.int64()),
        "doc_id": ["k0"],
        "n_tok": pa.array([99], pa.int32()),
        "lang": ["en"],
    })
    apply_events_dataset(ray.data.from_arrow(e2), td, 2, e2.schema, num_partitions=4)
    got = sorted(
        read_table(td, columns=["doc_id", "lang", "n_tok"]).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert [r["doc_id"] for r in got] == [f"k{i}" for i in range(8)]
    langs = {r["doc_id"]: r["lang"] for r in got}
    assert langs["k0"] == "en"
    assert all(langs[f"k{i}"] is None for i in range(1, 8))
    assert {r["doc_id"]: r["n_tok"] for r in got}["k0"] == 99


def test_columns_projection(table):
    got = read_keys(
        table, table_to_arrow(table)["doc_id"].to_pylist()[:2],
        columns=["doc_id", "n_tok"],
    )
    assert got.column_names == ["doc_id", "n_tok"]


def _absent_inrange_key(table):
    """An ABSENT key that lands inside its routed partition's zone-map
    range — so only the bloom (not the zone map) can prune it."""
    from gamechanger_data_ray.core.hashing import partition_ids
    from gamechanger_data_ray.state import manifest as mf

    cur = mf.load_current(table)
    npart = cur.num_partitions
    present = set(_alive(table_to_arrow(table))["doc_id"].to_pylist())
    for i in range(500):
        k = f"doc-{i:08d}a"
        if k in present:
            continue
        pid = partition_ids(pa.array([k]), npart).to_pylist()[0]
        e = cur.partitions.get(str(pid))
        if e and e.get("key_min") and e["key_min"] <= k <= e["key_max"]:
            return k
    raise AssertionError("no in-range absent key found")


def test_bloom_sidecars_written_and_prune_absent_keys(table):
    import glob
    import os

    sidecars = glob.glob(os.path.join(table, "part=*", "*.parquet.bloom"))
    assert sidecars, "rewrite merges must write bloom sidecars"
    # an absent key INSIDE its partition's zone range: only the bloom can
    # prove absence, and with it NO parquet file is touched
    k = _absent_inrange_key(table)
    assert routed_partition_files(table, [k]) == []
    assert read_keys(table, [k]).num_rows == 0
    # present keys still resolve through the bloom
    full = _alive(table_to_arrow(table))
    keys = full["doc_id"].to_pylist()[:5]
    got = read_keys(table, keys)
    assert sorted(got["doc_id"].to_pylist()) == sorted(keys)


def test_lookup_without_sidecars_still_works(table, tmp_path):
    """Tables written before sidecars existed (or with sidecars deleted)
    only lose the shortcut."""
    import glob
    import os
    import shutil

    k = _absent_inrange_key(table)
    td = str(tmp_path / "nosc")
    shutil.copytree(table, td)
    for s in glob.glob(os.path.join(td, "part=*", "*.bloom")):
        os.remove(s)
    assert routed_partition_files(td, [k]) != []        # no bloom, no prune
    assert read_keys(td, [k]).num_rows == 0             # still correct
    full = _alive(table_to_arrow(td))
    keys = full["doc_id"].to_pylist()[:5]
    assert sorted(read_keys(td, keys)["doc_id"].to_pylist()) == sorted(keys)


def test_vacuum_sweeps_orphaned_sidecars(tmp_path):
    import glob
    import os

    from gamechanger_data_ray.engine.maintenance import vacuum

    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=3, events_per_epoch=300, num_keys=60)
    replay(cd, td, num_partitions=4, epochs_per_commit=1)
    all_blooms = set(glob.glob(os.path.join(td, "part=*", "*.bloom")))
    assert len(all_blooms) > 4  # several epochs' bases have sidecars
    vacuum(td, keep_epochs=1)
    left = set(glob.glob(os.path.join(td, "part=*", "*.bloom")))
    live = set(glob.glob(os.path.join(td, "part=*", "*.parquet")))
    assert left < all_blooms  # orphans swept
    assert left == {p + ".bloom" for p in live}  # exactly the live bases' sidecars
    # lookups still green post-vacuum
    full = _alive(table_to_arrow(td))
    keys = full["doc_id"].to_pylist()[:3]
    assert sorted(read_keys(td, keys)["doc_id"].to_pylist()) == sorted(keys)


def test_compaction_writes_sidecar_and_bloom_prunes_after(tmp_path):
    from gamechanger_data_ray.engine.maintenance import compact

    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=2, events_per_epoch=300, num_keys=60)
    replay(cd, td, num_partitions=4, epochs_per_commit=1, merge_policy="delta")
    compact(td)
    import glob
    import os

    from gamechanger_data_ray.state import manifest as mf

    cur = mf.load_current(td)
    assert all(not e.get("deltas") for e in cur.partitions.values())
    bases = [os.path.join(td, e["file"]) for e in cur.partitions.values() if e.get("file")]
    assert bases and all(os.path.exists(b + ".bloom") for b in bases)
    k = _absent_inrange_key(td)
    assert routed_partition_files(td, [k]) == []
