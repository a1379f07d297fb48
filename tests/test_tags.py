"""Named snapshot tags: pin retained epochs through vacuum, time-travel by
name, tag lifecycle + guards."""

from __future__ import annotations

import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import read_table_asof, replay
from gamechanger_data_ray.engine.maintenance import (
    list_manifests,
    list_tags,
    resolve_tag,
    tag,
    untag,
    vacuum,
)


def _table(tmp_path, epochs=4):
    cl, tb = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cl, num_epochs=epochs, events_per_epoch=400, num_keys=80)
    replay(cl, tb, num_partitions=4, epochs_per_commit=1)
    return tb


def test_tag_pins_epoch_through_vacuum(tmp_path):
    tb = _table(tmp_path)
    assert list_manifests(tb) == [1, 2, 3, 4]
    tag(tb, "v1-release", epoch=1)
    rows_at_1 = read_table_asof(tb, "v1-release").count()
    out = vacuum(tb, keep_epochs=1)
    # tagged epoch 1 survives retention; untagged 2 and 3 are dropped
    assert out["manifests_kept"] == [1, 4]
    assert list_manifests(tb) == [1, 4]
    assert read_table_asof(tb, "v1-release").count() == rows_at_1
    with pytest.raises(FileNotFoundError):
        read_table_asof(tb, 2)
    # untag → the next vacuum evicts epoch 1 too
    untag(tb, "v1-release")
    out2 = vacuum(tb, keep_epochs=1)
    assert out2["manifests_kept"] == [4]
    with pytest.raises(KeyError):
        read_table_asof(tb, "v1-release")


def test_tag_lifecycle_and_guards(tmp_path):
    tb = _table(tmp_path, epochs=2)
    assert list_tags(tb) == {}
    assert tag(tb, "latest") == {"latest": 2}  # defaults to committed epoch
    assert tag(tb, "latest", epoch=1) == {"latest": 1}  # moves
    tag(tb, "other")
    assert resolve_tag(tb, "latest") == 1
    assert list_tags(tb) == {"latest": 1, "other": 2}
    with pytest.raises(ValueError):
        tag(tb, "bad", epoch=99)  # no retained manifest
    with pytest.raises(KeyError):
        untag(tb, "nope")
    assert untag(tb, "other") == {"latest": 1}
