"""Anti-entropy table checksums: the content digest must be invariant to
row order, partition count, storage layout (copy-on-write vs merge-on-read
deltas), and export/import — and must flip on any logical state change.
This is what lets a 256-node deployment verify a replica / resized table /
restored backup in O(P) driver traffic without row-by-row comparison."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import replay
from gamechanger_data_ray.engine.maintenance import (
    compact,
    export_table,
    import_table,
    repartition_table,
    table_checksums,
)

ZERO = "0" * 64


@pytest.fixture()
def table(tmp_path):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=3, events_per_epoch=800, num_keys=150,
                    evolution=True)
    replay(cd, td, num_partitions=4)
    return cd, td


def test_checksum_shape_and_nonzero(table):
    _, td = table
    c = table_checksums(td)
    assert c["rows"] > 0
    assert len(c["digest"]) == 64 and c["digest"] != ZERO
    assert sum(p["rows"] for p in c["by_partition"].values()) == c["rows"]


def test_checksum_deterministic(table):
    _, td = table
    assert table_checksums(td)["digest"] == table_checksums(td)["digest"]


def test_checksum_invariant_under_repartition(table, tmp_path):
    _, td = table
    out = str(tmp_path / "tb7")
    repartition_table(td, out, new_partitions=7)
    a, b = table_checksums(td), table_checksums(out)
    assert a["digest"] == b["digest"] and a["rows"] == b["rows"]
    # per-partition digests legitimately differ (different modulus)
    assert len(b["by_partition"]) != len(a["by_partition"])


def test_checksum_invariant_under_export_import(table, tmp_path):
    _, td = table
    bundle, imp = str(tmp_path / "bundle"), str(tmp_path / "imp")
    export_table(td, bundle)
    import_table(bundle, imp)
    assert table_checksums(imp)["digest"] == table_checksums(td)["digest"]


def test_checksum_merge_on_read_equals_compacted(tmp_path):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=3, events_per_epoch=800, num_keys=150)
    replay(cd, td, num_partitions=4, epochs_per_commit=1, merge_policy="delta")
    with_deltas = table_checksums(td)
    compact(td)
    compacted = table_checksums(td)
    assert with_deltas["digest"] == compacted["digest"]
    assert with_deltas["by_partition"] == compacted["by_partition"]


def test_checksum_flips_on_state_change(table, tmp_path):
    cd, td = table
    before = table_checksums(td)
    # same seed + params with one MORE epoch: epochs 1-3 regenerate
    # identically (below the committed watermark, so skipped) and only
    # epoch 4 applies
    cl2 = str(tmp_path / "cl2")
    write_changelog(cl2, num_epochs=4, events_per_epoch=800, num_keys=150,
                    evolution=True)
    replay(cl2, td, num_partitions=4)
    after = table_checksums(td)
    assert after["digest"] != before["digest"]
    # only the partitions that actually changed flip their digests
    changed = {p for p in after["by_partition"]
               if after["by_partition"][p] != before["by_partition"].get(p)}
    assert changed


def test_checksum_empty_table(tmp_path):
    c = table_checksums(str(tmp_path / "nowhere"))
    assert c == {"rows": 0, "digest": ZERO, "by_partition": {}}


def test_checksum_cli(table, tmp_path):
    _, td = table
    out = str(tmp_path / "tb7")
    repartition_table(td, out, new_partitions=7)
    r = subprocess.run(
        [sys.executable, "-m", "gamechanger_data_ray", "--num-cpus", "4",
         "checksum", "--table", td, "--against", out],
        capture_output=True, text=True,
        env=dict(os.environ, PYTHONPATH="/root/repo"), cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["equal"] is True
    assert res["digest"] == res["against"]["digest"]


def test_checksum_fold_properties():
    """The XOR fold itself: permutation- and split-invariant, single-bit
    sensitive (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    def fold(digests):
        acc = np.zeros(32, dtype=np.uint8)
        for d in digests:
            acc ^= np.frombuffer(d, dtype=np.uint8)
        return bytes(acc)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.binary(min_size=32, max_size=32), min_size=1, max_size=20),
           st.randoms(use_true_random=False))
    def check(digests, rnd):
        base = fold(digests)
        shuffled = list(digests)
        rnd.shuffle(shuffled)
        assert fold(shuffled) == base  # order-independent
        cut = rnd.randrange(len(digests) + 1)
        assert fold([fold(digests[:cut]), fold(digests[cut:])]) == base  # split-independent
        flipped = bytearray(digests[0])
        flipped[0] ^= 1
        assert fold([bytes(flipped)] + list(digests[1:])) != base  # bit-sensitive

    check()
