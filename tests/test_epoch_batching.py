"""Epoch batching must be byte-identical to epoch-at-a-time replay (the LWW
reduce is associative over the (lsn, seq) total order)."""

from __future__ import annotations

import os

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import replay, table_to_arrow
from gamechanger_data_ray.state import manifest as mf


def test_batched_equals_per_epoch(tmp_path):
    cd = str(tmp_path / "cl")
    write_changelog(cd, num_epochs=4, events_per_epoch=1200, num_keys=250, evolution=True, zipf_a=1.4)

    t_one = str(tmp_path / "one")
    t_batch = str(tmp_path / "batch")
    t_two = str(tmp_path / "two")
    replay(cd, t_one, num_partitions=4, epochs_per_commit=1)
    replay(cd, t_batch, num_partitions=4)  # all four epochs, one commit
    replay(cd, t_two, num_partitions=4, epochs_per_commit=2)

    a, b, c = table_to_arrow(t_one), table_to_arrow(t_batch), table_to_arrow(t_two)
    assert a.equals(b)
    assert a.equals(c)
    # all converge to the same committed epoch
    assert (
        mf.committed_epoch(t_one)
        == mf.committed_epoch(t_batch)
        == mf.committed_epoch(t_two)
        == 4
    )
    # batched totals still count every raw event exactly once
    assert (
        mf.load_current(t_batch).totals["events_in"]
        == mf.load_current(t_one).totals["events_in"]
    )


def test_staged_and_sort_exchanges_identical(tmp_path):
    """Both physical shuffles must produce byte-identical tables, counters
    and no leftover staging debris."""
    import os

    cd = str(tmp_path / "cl")
    write_changelog(cd, num_epochs=3, events_per_epoch=1500, num_keys=300, zipf_a=1.5)
    t_staged = str(tmp_path / "staged")
    t_sort = str(tmp_path / "sorted")
    replay(cd, t_staged, num_partitions=4, exchange="staged")
    replay(cd, t_sort, num_partitions=4, exchange="sort")
    assert table_to_arrow(t_staged).equals(table_to_arrow(t_sort))
    ms, mo = mf.load_current(t_staged), mf.load_current(t_sort)
    assert ms.totals == mo.totals
    assert ms.epoch_counters["per_partition"] == mo.epoch_counters["per_partition"]
    assert not os.path.exists(os.path.join(t_staged, "_staging")) or not os.listdir(
        os.path.join(t_staged, "_staging")
    )
