"""Live-tailing loop vs a concurrent producer: epochs written (with
ready-marker gating) while the tailer polls must all land, in order, and
converge to the same state as a cold replay of the full changelog."""

from __future__ import annotations

import os
import threading
import time

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import replay, table_to_arrow, tail


def test_tail_applies_epochs_as_producer_writes(tmp_path):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")

    def produce():
        # epoch 1 immediately; 2 and 3 staggered while the tailer runs
        write_changelog(cd, num_epochs=1, events_per_epoch=600, num_keys=120)
        time.sleep(1.5)
        write_changelog(cd, num_epochs=2, events_per_epoch=600, num_keys=120)
        time.sleep(1.5)
        write_changelog(cd, num_epochs=3, events_per_epoch=600, num_keys=120)

    producer = threading.Thread(target=produce)
    producer.start()
    try:
        m = tail(cd, td, num_partitions=4, poll_interval=0.5, idle_polls=8)
    finally:
        producer.join()
    assert m is not None and m.epoch == 3
    # tailed state == cold replay of the same changelog
    td2 = str(tmp_path / "tb2")
    replay(cd, td2, num_partitions=4)
    assert table_to_arrow(td).equals(table_to_arrow(td2))


def test_tail_idles_out_on_quiet_changelog(tmp_path):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=2, events_per_epoch=400, num_keys=80)
    t0 = time.monotonic()
    m = tail(cd, td, num_partitions=4, poll_interval=0.2, idle_polls=2)
    assert m is not None and m.epoch == 2
    assert time.monotonic() - t0 < 60
    # second tail: nothing new, returns committed state unchanged
    m2 = tail(cd, td, num_partitions=4, poll_interval=0.2, idle_polls=1)
    assert m2 is not None and m2.epoch == 2
