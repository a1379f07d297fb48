"""Anti-entropy repair (engine/maintenance.py::repair_from_replica):
diverged partitions converge to the replica's content; already-equal
tables no-op; epoch mismatches refuse."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.maintenance import repair_from_replica, table_checksums


def _events(rows):
    op, lsn, seq, doc, toks = zip(*rows)
    return pa.table(
        {"op": pa.array(op, pa.string()),
         "lsn": pa.array(lsn, pa.int64()),
         "seq": pa.array(seq, pa.int64()),
         "doc_id": pa.array(doc, pa.string()),
         "tokens": pa.array([list(t) if t is not None else None for t in toks],
                            pa.list_(pa.int32()))}
    )


def _build(tb: str, n: int = 40, parts: int = 4, epochs: int = 1):
    for e in range(1, epochs + 1):
        ev = _events([("I", e, i, f"d{i:03d}", [i, i + e]) for i in range(n)])
        apply_events_dataset(ray.data.from_arrow(ev), tb, e, ev.schema,
                             num_partitions=parts)


def _rot_one_partition(tb: str) -> str:
    """Silent bit-rot that still parses: drop a row from one committed
    partition file (what a torn write or a bad disk sector can leave)."""
    f = sorted(glob.glob(os.path.join(tb, "part=*", "*.parquet")))[0]
    t = pq.read_table(f)
    pq.write_table(t.slice(1), f)
    return f


def test_repair_converges_diverged_partitions(tmp_path, ray_session):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a)
    shutil.copytree(a, b)
    assert table_checksums(a)["digest"] == table_checksums(b)["digest"]

    _rot_one_partition(a)
    assert table_checksums(a)["digest"] != table_checksums(b)["digest"]

    out = repair_from_replica(a, b)
    assert out["repaired"] == 1 and len(out["diverged"]) == 1
    assert out["equal_after"] is True
    assert table_checksums(a)["digest"] == table_checksums(b)["digest"]
    # logical state fully restored, not just digests
    ta = table_to_arrow(a).sort_by("doc_id")
    tb2 = table_to_arrow(b).sort_by("doc_id")
    assert ta.equals(tb2)


def test_repair_noop_when_converged(tmp_path, ray_session):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a)
    shutil.copytree(a, b)
    out = repair_from_replica(a, b)
    assert out == {"diverged": [], "repaired": 0, "equal_after": True,
                   "digest": table_checksums(a)["digest"]}


def test_repair_refuses_epoch_mismatch(tmp_path, ray_session):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a, epochs=1)
    shutil.copytree(a, b)
    ev = _events([("I", 2, 0, "extra", [1])])
    apply_events_dataset(ray.data.from_arrow(ev), b, 2, ev.schema,
                         num_partitions=4)
    with pytest.raises(ValueError, match="epoch mismatch"):
        repair_from_replica(a, b)


def test_repair_cli_verb(tmp_path, ray_session):
    import json

    from gamechanger_data_ray.__main__ import main

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a, n=20, parts=2)
    shutil.copytree(a, b)
    _rot_one_partition(a)
    assert main(["repair", "--table", a, "--from-replica", b]) == 0
    assert table_checksums(a)["digest"] == table_checksums(b)["digest"]
