"""Chained-CDC relay benchmark — prints ONE JSON line.

Measures the table→table subscription path (``engine/diff.py::relay``):
  1. replay the bench changelog's first 3 epochs into a SOURCE table
     (per-epoch commits, so the retained-manifest ladder exists);
  2. GENESIS relay: seed a fresh downstream table from the source's full
     committed state (one pure-insert diff, no exchange on the diff side);
  3. commit epoch 4 to the source, then CATCH-UP relay: diff
     state@3 → state@4 and LWW-apply only the changed rows;
  4. verify source and destination are byte-identical (anti-entropy
     checksums), and that the catch-up moved only the delta.

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default sf0.1) — sizes
the changelog through bench.py's generator cache.

Usage: python scripts/bench_relay.py  (owns its Ray session)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: changelog cache + sizing)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=bench.NUM_CPUS, include_dashboard=False
        )
    from gamechanger_data_ray.engine.cdc import replay
    from gamechanger_data_ray.engine.diff import relay
    from gamechanger_data_ray.engine.maintenance import table_checksums
    from gamechanger_data_ray.state import manifest as mf

    changelog = bench.ensure_changelog()
    base = f"/tmp/gcdr_bench/relay_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    src, dst = f"{base}/src", f"{base}/dst"
    parts = max(16, bench.NUM_CPUS)

    replay(changelog, src, num_partitions=parts, up_to_epoch=3,
           epochs_per_commit=1)
    src_rows = mf.load_current(src).totals["rows"]

    t0 = time.perf_counter()
    g = relay(src, dst, num_partitions=parts)
    genesis_s = time.perf_counter() - t0
    assert g["mode"] == "genesis", g

    replay(changelog, src, num_partitions=parts, up_to_epoch=4)
    ev_before = mf.load_current(dst).totals["events_in"]

    t0 = time.perf_counter()
    c = relay(src, dst, num_partitions=parts)
    catchup_s = time.perf_counter() - t0
    assert c["mode"] == "diff" and c["dst_epoch_after"] == 4, c
    delta_events = mf.load_current(dst).totals["events_in"] - ev_before

    identical = table_checksums(src) == table_checksums(dst)
    shutil.rmtree(base, ignore_errors=True)

    print(json.dumps({
        "metric": "cdc_relay",
        "unit": "sec",
        "sf": bench._sf_name(),
        "num_cpus": bench.NUM_CPUS,
        "genesis_sec": round(genesis_s, 3),
        "genesis_rows": int(src_rows),
        "genesis_rows_per_sec": round(src_rows / genesis_s, 1),
        "catchup_sec": round(catchup_s, 3),
        "catchup_delta_events": int(delta_events),
        "catchup_events_per_sec": round(delta_events / catchup_s, 1),
        "tables_identical": bool(identical),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
