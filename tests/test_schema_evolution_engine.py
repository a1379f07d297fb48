"""Engine-level schema-evolution gates: the E4 negative case must fail the
epoch WITHOUT corrupting the committed table (FIXTURES.md §F3-E4)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.core.reconcile import SchemaEvolutionError
from gamechanger_data_ray.engine.cdc import apply_epoch, replay, table_to_arrow
from gamechanger_data_ray.state import manifest as mf


def _write_poison_epoch(changelog_dir: str, epoch: int) -> None:
    """An epoch whose n_tok arrives as a string — a narrowing/kind
    conflict that must raise, not corrupt."""
    d = os.path.join(changelog_dir, f"epoch={epoch:06d}")
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "op": ["U"],
            "lsn": pa.array([epoch], pa.int64()),
            "seq": pa.array([0], pa.int64()),
            "version_hash": ["x"],
            "doc_id": ["doc-00000001"],
            "tokens": pa.array([[1, 2]], pa.list_(pa.int32())),
            "n_tok": ["not-a-number"],  # E4: kind conflict
            "source": ["us_code"],
        }
    )
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    with open(os.path.join(d, "_MANIFEST.json"), "w") as f:
        json.dump({"epoch": epoch, "files": ["part-00000.parquet"]}, f)


def test_e4_poison_epoch_fails_without_corruption(tmp_path):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=2, events_per_epoch=500, num_keys=100)
    replay(cd, td, num_partitions=4)
    good_state = table_to_arrow(td)
    good_epoch = mf.committed_epoch(td)

    _write_poison_epoch(cd, 3)
    with pytest.raises(SchemaEvolutionError):
        apply_epoch(cd, td, 3, num_partitions=4)

    # the table is untouched: same committed epoch, byte-identical content
    assert mf.committed_epoch(td) == good_epoch
    assert table_to_arrow(td).equals(good_state)

    # and after the poison epoch is fixed upstream, replay proceeds
    import shutil

    shutil.rmtree(os.path.join(cd, "epoch=000003"))
    write_changelog(cd, num_epochs=3, events_per_epoch=500, num_keys=100)
    m = replay(cd, td, num_partitions=4)
    assert m.epoch == 3


def test_heavy_skew_replay_correct(tmp_path):
    """zipf 2.0 over 100 keys: a few keys receive most of 30k events; the
    weighted combiner must keep the merge correct and the counters exact."""
    import duckdb
    import glob

    from gamechanger_data_ray.core.reconcile import conform, unify_all

    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=2, events_per_epoch=15_000, num_keys=100, zipf_a=2.0)
    m = replay(cd, td, num_partitions=4)

    files = sorted(glob.glob(os.path.join(cd, "epoch=*", "*.parquet")))
    uni = unify_all([pq.read_schema(f) for f in files])
    all_ev = pa.concat_tables([conform(pq.read_table(f), uni) for f in files])
    assert m.totals["events_in"] == all_ev.num_rows

    con = duckdb.connect()
    con.register("ev", all_ev)
    oracle = con.sql(
        """SELECT doc_id, tokens, n_tok, source FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY lsn DESC, seq DESC) rn FROM ev)
           WHERE rn = 1 AND op <> 'D' ORDER BY doc_id"""
    ).arrow()
    mine = table_to_arrow(td).select(["doc_id", "tokens", "n_tok", "source"])
    assert mine.cast(oracle.schema).equals(oracle)
