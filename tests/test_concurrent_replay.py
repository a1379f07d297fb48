"""Two replay drivers racing the same table: commits are fenced (forward-
only), both processes exit cleanly, and the final state is byte-identical
to a single-driver replay — the concurrent/stale-attempt claim of the
manifest protocol under real process concurrency."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import replay, table_to_arrow


def test_racing_replays_converge(tmp_path):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=3, events_per_epoch=1500, num_keys=250)

    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "gamechanger_data_ray", "--num-cpus", "4",
             "replay", "--changelog", cd, "--table", td, "--partitions", "4",
             "--epochs-per-commit", "1"],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for _ in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    reported = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-500:]
        # a racer fenced out of later epochs reports its own LAST commit,
        # which can trail the table's final epoch — never exceed it
        e = json.loads(out.strip().splitlines()[-1])["epoch"]
        assert e is None or 1 <= e <= 3
        reported.append(e)
    assert 3 in reported  # someone finished the job
    from gamechanger_data_ray.state import manifest as mf

    assert mf.committed_epoch(td) == 3

    # reference state from a clean single replay
    clean = str(tmp_path / "clean")
    replay(cd, clean, num_partitions=4)
    assert table_to_arrow(td).equals(table_to_arrow(clean))
