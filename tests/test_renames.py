"""Schema-evolution RENAME support: a producer that renames a column
mid-stream keeps writing to the same table column via the source-boundary
rename map (reference analog: the rename/delete projection of
``parsers/policy_analytics/parse.py:154-205``). Epochs from before AND
after the rename conform through one map."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.core.reconcile import (
    SchemaEvolutionError,
    rename_schema,
    rename_table,
)
from gamechanger_data_ray.engine.cdc import replay, table_to_arrow


def _renamed_changelog(src: str, dst: str, epoch: int, renames: dict) -> None:
    """Copy a changelog, renaming columns in the given epoch's files —
    simulates a producer that renamed a column starting at that epoch."""
    shutil.copytree(src, dst)
    for f in glob.glob(os.path.join(dst, f"epoch={epoch:06d}", "*.parquet")):
        t = pq.read_table(f)
        t = t.rename_columns([renames.get(n, n) for n in t.schema.names])
        pq.write_table(t, f)


@pytest.fixture()
def changelogs(tmp_path):
    cl = str(tmp_path / "cl")
    write_changelog(cl, num_epochs=2, events_per_epoch=600, num_keys=120)
    cl_renamed = str(tmp_path / "cl_renamed")
    _renamed_changelog(cl, cl_renamed, epoch=2, renames={"source": "origin"})
    return cl, cl_renamed


def test_rename_map_reconverges_to_identical_state(changelogs, tmp_path):
    cl, cl_renamed = changelogs
    ta, tb = str(tmp_path / "ta"), str(tmp_path / "tb")
    replay(cl, ta, num_partitions=4)
    # epoch 1 carries "source", epoch 2 carries "origin"; ONE map handles both
    replay(cl_renamed, tb, num_partitions=4, renames={"origin": "source"})
    a, b = table_to_arrow(ta), table_to_arrow(tb)
    assert a.schema.names == b.schema.names
    assert a.equals(b)


def test_unmapped_rename_nullfills_as_new_column(changelogs, tmp_path):
    """WITHOUT the map, the renamed epoch's column lands as a NEW column
    (add-with-null-fill) — the safe generic behavior, not corruption."""
    _, cl_renamed = changelogs
    tb = str(tmp_path / "tb")
    replay(cl_renamed, tb, num_partitions=4)
    t = table_to_arrow(tb)
    assert "source" in t.schema.names and "origin" in t.schema.names
    # every alive row's last write is epoch 2 (every key touched), so the
    # old-name column is all-null and the new-name column fully populated
    assert t["source"].null_count == t.num_rows
    assert t["origin"].null_count == 0


def test_rename_collision_raises():
    t = pa.table({"a": [1], "b": [2]})
    with pytest.raises(SchemaEvolutionError):
        rename_table(t, {"a": "b"})
    with pytest.raises(SchemaEvolutionError):
        rename_schema(t.schema, {"a": "c", "b": "c"})


def test_rename_passthrough_when_old_name_absent():
    t = pa.table({"source": ["x"]})
    out = rename_table(t, {"origin": "source"})  # transition map, pre-rename batch
    assert out.schema.names == ["source"]
    s = rename_schema(t.schema, {"origin": "source"})
    assert s.names == ["source"]


def test_rename_cli(changelogs, tmp_path):
    import json
    import subprocess
    import sys

    _, cl_renamed = changelogs
    tb = str(tmp_path / "tb_cli")
    r = subprocess.run(
        [sys.executable, "-m", "gamechanger_data_ray", "--num-cpus", "4",
         "replay", "--changelog", cl_renamed, "--table", tb,
         "--partitions", "4", "--rename", "origin=source"],
        capture_output=True, text=True,
        env=dict(os.environ, PYTHONPATH="/root/repo"), cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["epoch"] == 2
    t = table_to_arrow(tb)
    assert "origin" not in t.schema.names and "source" in t.schema.names


def test_union_replay_per_source_renames(changelogs, tmp_path):
    """Two sources, one renamed its column: per-source maps converge the
    union to the same schema/state as the all-canonical union."""
    from gamechanger_data_ray.engine.cdc import replay_union

    cl, cl_renamed = changelogs
    # canonical union of the SAME source twice would collide on seq remap
    # determinism, so compare: union(cl, cl_renamed+map) vs union(cl, cl)
    ta, tb = str(tmp_path / "ua"), str(tmp_path / "ub")
    replay_union([cl, cl], ta, num_partitions=4)
    replay_union([cl, cl_renamed], tb, num_partitions=4,
                 renames=[None, {"origin": "source"}])
    a, b = table_to_arrow(ta), table_to_arrow(tb)
    assert a.schema.names == b.schema.names
    assert a.equals(b)
