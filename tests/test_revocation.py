"""Engine-level revocation sweep (absence-as-event, J3) tests."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import (
    apply_revocation_sweep,
    replay,
    table_to_arrow,
)
from gamechanger_data_ray.state import manifest as mf


@pytest.fixture()
def table(tmp_path):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=2, events_per_epoch=800, num_keys=150, dup_frac=0.0)
    replay(cd, td, num_partitions=4)
    return td


def test_sweep_tombstones_absent_keys_of_covered_sources(table):
    before = table_to_arrow(table)
    srcs = before["source"].to_pylist()
    keys = before["doc_id"].to_pylist()
    covered = "us_code"
    covered_keys = [k for k, s in zip(keys, srcs) if s == covered]
    assert len(covered_keys) > 4
    alive = covered_keys[:3]  # everything else in us_code gets revoked
    alive_pairs = pd.DataFrame({"source": [covered] * 3, "doc_id": alive})

    m = apply_revocation_sweep(table, alive_pairs, epoch=10, num_partitions=4)
    assert m is not None and m.epoch == 10
    after = table_to_arrow(table)
    after_keys = set(after["doc_id"].to_pylist())

    for k in covered_keys[3:]:
        assert k not in after_keys  # revoked
    for k in alive:
        assert k in after_keys  # still alive
    # uncovered sources untouched
    uncovered_before = {k for k, s in zip(keys, srcs) if s != covered}
    assert uncovered_before <= after_keys
    assert m.epoch_counters["deletes"] == len(covered_keys) - 3


def test_sweep_with_everything_alive_is_a_noop_commit(table):
    before = table_to_arrow(table)
    alive_pairs = pd.DataFrame(
        {"source": before["source"].to_pylist(), "doc_id": before["doc_id"].to_pylist()}
    )
    m = apply_revocation_sweep(table, alive_pairs, epoch=11, num_partitions=4)
    assert m is not None and m.epoch == 11  # watermark advances
    assert table_to_arrow(table).equals(before)  # content identical
    assert m.epoch_counters["deletes"] == 0


def test_sweep_is_fenced(table):
    alive_pairs = pd.DataFrame({"source": ["us_code"], "doc_id": ["doc-00000000"]})
    apply_revocation_sweep(table, alive_pairs, epoch=12, num_partitions=4)
    # stale repeat at same epoch: fenced no-op
    assert apply_revocation_sweep(table, alive_pairs, epoch=12, num_partitions=4) is None
