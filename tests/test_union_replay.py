"""Multi-source union replay: several changelogs (different seeds/cadences)
merge into one table, deterministically, matching the DuckDB oracle over
the remapped union of all events."""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.core.reconcile import conform, unify_all
from gamechanger_data_ray.engine.cdc import replay_union, table_to_arrow


def _oracle(dirs, n):
    tabs = []
    for i, d in enumerate(dirs):
        for f in sorted(glob.glob(os.path.join(d, "epoch=*", "*.parquet"))):
            t = pq.read_table(f)
            seq = pa.array([s * n + i for s in t["seq"].to_pylist()], pa.int64())
            tabs.append(t.set_column(t.schema.get_field_index("seq"), "seq", seq))
    uni = unify_all([t.schema for t in tabs])
    ev = pa.concat_tables([conform(t, uni) for t in tabs])
    con = duckdb.connect()
    con.register("ev", ev)
    cols = "doc_id, tokens, n_tok, source"
    return con.sql(
        f"""SELECT {cols} FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY lsn DESC, seq DESC) rn FROM ev)
            WHERE rn = 1 AND op <> 'D' ORDER BY doc_id"""
    ).arrow()


def test_union_replay_matches_oracle(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # overlapping key spaces, different seeds; b lags one epoch behind
    write_changelog(a, num_epochs=3, events_per_epoch=1200, num_keys=200, seed=1)
    write_changelog(b, num_epochs=2, events_per_epoch=1200, num_keys=200, seed=2)
    td = str(tmp_path / "tb")
    # epoch 3 must NOT apply yet: b has neither published 3 nor anything
    # beyond it — "dir absent" could mean "about to publish", so the union
    # waits instead of silently dropping b's late epoch-3 events
    m = replay_union([a, b], td, num_partitions=4)
    assert m is not None and m.epoch == 2
    # b catches up → epoch 3 applies and the table matches the full oracle
    write_changelog(b, num_epochs=3, events_per_epoch=1200, num_keys=200, seed=2)
    m = replay_union([a, b], td, num_partitions=4)
    assert m is not None and m.epoch == 3
    got = table_to_arrow(td).select(["doc_id", "tokens", "n_tok", "source"])
    oracle = _oracle([a, b], 2)
    assert got.cast(oracle.schema).equals(oracle)


def test_union_replay_skipped_epoch_applies_when_source_moves_past(tmp_path):
    """A source that SKIPS an epoch (publishes beyond it without it) must
    not block the union: a vouches for b's missing epoch range once its
    own highest ready epoch is greater."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_changelog(a, num_epochs=1, events_per_epoch=600, num_keys=100, seed=3)
    write_changelog(b, num_epochs=3, events_per_epoch=600, num_keys=100, seed=4)
    td = str(tmp_path / "tb")
    # a's highest is 1 < 2, so only epoch 1 applies on the first pass
    m = replay_union([a, b], td, num_partitions=4)
    assert m is not None and m.epoch == 1
    # a jumps straight to epoch 3 (2 genuinely skipped) → 2 and 3 apply
    write_changelog(a, num_epochs=3, events_per_epoch=600, num_keys=100, seed=3)
    import shutil

    shutil.rmtree(f"{a}/epoch=000002")  # a truly skipped epoch 2
    m = replay_union([a, b], td, num_partitions=4)
    assert m is not None and m.epoch == 3


def test_union_replay_is_deterministic_and_incremental(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_changelog(a, num_epochs=2, events_per_epoch=800, num_keys=150, seed=5)
    write_changelog(b, num_epochs=2, events_per_epoch=800, num_keys=150, seed=6)
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    replay_union([a, b], t1, num_partitions=4)
    replay_union([a, b], t2, num_partitions=4)
    assert table_to_arrow(t1).equals(table_to_arrow(t2))
    # new epoch lands incrementally on the same table once BOTH sources
    # have published it (absence ≠ skip — see replay_union gating)
    write_changelog(a, num_epochs=3, events_per_epoch=800, num_keys=150, seed=5)
    write_changelog(b, num_epochs=3, events_per_epoch=800, num_keys=150, seed=6)
    m = replay_union([a, b], t1, num_partitions=4)
    assert m is not None and m.epoch == 3


def test_union_replay_with_heterogeneous_schemas(tmp_path):
    """One source evolves (lang column at e3, n_tok widens at e4), the
    other stays on the base schema — the union must reconcile before the
    merge exactly like single-source evolution."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_changelog(a, num_epochs=4, events_per_epoch=900, num_keys=180,
                    seed=7, evolution=True)
    write_changelog(b, num_epochs=4, events_per_epoch=900, num_keys=180,
                    seed=8, evolution=False)
    td = str(tmp_path / "tb")
    m = replay_union([a, b], td, num_partitions=4)
    assert m is not None and m.epoch == 4
    got = table_to_arrow(td)
    assert "lang" in got.schema.names  # evolved column present, null for b rows
    got_sel = got.select(["doc_id", "tokens", "n_tok", "source"])
    oracle = _oracle([a, b], 2)
    assert got_sel.cast(oracle.schema).equals(oracle)
