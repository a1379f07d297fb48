"""Event-time windowed-view benchmark — prints ONE JSON line.

Measures the refresh economics of ``engine/window_view.py`` on the same
changelog the headline bench uses (the event-time axis is ``n_tok`` —
any int64 column works; the economics are axis-independent):

  1. replay the bench changelog's first 4 epochs into a CDC table;
  2. BOOTSTRAP: first refresh folds the whole table state;
  3. SPARSE commit: a tiny epoch 5 (200 events over 10 doc ids);
  4. INCREMENTAL refresh: folds only the epoch-5 Z-set delta (late
     pairs diverted, triggers emitted) — the steady-state cost;
  5. REBUILD contrast: bootstrap of a fresh view dir at the same head.

At 10^10 events the incremental refresh moves O(delta) rows + O(dirty
view partitions) merge work; the rebuild moves O(table). The ratio
printed here is the single-node shadow of that asymptote.

Usage: python scripts/bench_window_view.py  (owns its Ray session)
Env: RAY_GRAFT_CPUS, GRAFT_SF_DIR — same sizing as bench.py.
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
    import pyarrow.parquet as pq

    from gamechanger_data_ray.core.changelog import (
        READY_MARKER, epoch_dir, generate_epoch_table,
    )
    from gamechanger_data_ray.engine.cdc import replay
    from gamechanger_data_ray.engine.window_view import (
        EventWindowView, refresh_windowed,
    )

    changelog = bench.ensure_changelog()
    base = f"/tmp/gcdr_bench/wview_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    tb = f"{base}/tb"
    parts = max(16, bench.NUM_CPUS)

    view = EventWindowView("n_tok", width=8, slide=4,
                           sums={"sum_tok": "n_tok"}, lateness=16)

    m4 = replay(changelog, tb, num_partitions=parts, up_to_epoch=4)
    rows4 = int(m4.totals["rows"])

    t0 = time.perf_counter()
    mb = refresh_windowed(view, f"{base}/wv", tb, num_partitions=16)
    bootstrap_s = time.perf_counter() - t0
    assert mb.epoch_counters["mode"] == "bootstrap"

    # sparse epoch 5: 200 events over 10 doc ids via a symlinked changelog
    cl5 = f"{base}/changelog5"
    os.makedirs(cl5, exist_ok=True)
    for e in range(1, 5):
        src, dst = epoch_dir(changelog, e), epoch_dir(cl5, e)
        if not os.path.exists(dst):
            os.symlink(src, dst)
    d5 = epoch_dir(cl5, 5)
    os.makedirs(d5, exist_ok=True)
    t5 = generate_epoch_table(
        5, 200, 10, seed=42, zipf_a=0.0, mean_tokens=96,
        evolution=True, dup_frac=0.0,
    )
    pq.write_table(t5, os.path.join(d5, "part-00000.parquet"))
    with open(os.path.join(d5, READY_MARKER), "w") as f:
        json.dump({"epoch": 5, "files": ["part-00000.parquet"],
                   "events": t5.num_rows}, f)
    replay(cl5, tb, num_partitions=parts, up_to_epoch=5)

    t0 = time.perf_counter()
    mi = refresh_windowed(view, f"{base}/wv", tb)
    incremental_s = time.perf_counter() - t0
    assert mi.epoch_counters["mode"] == "incremental"

    t0 = time.perf_counter()
    mr = refresh_windowed(view, f"{base}/wv2", tb, num_partitions=16)
    rebuild_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "window_view_refresh",
        "unit": "sec",
        "table_rows": rows4,
        "bootstrap_sec": round(bootstrap_s, 3),
        "sparse_incremental_sec": round(incremental_s, 3),
        "rebuild_at_head_sec": round(rebuild_s, 3),
        "incremental_speedup_vs_rebuild": round(rebuild_s / incremental_s, 2),
        "windows": int(mi.totals["rows"]),
        "late_rows": mi.epoch_counters["late_rows"],
        "trigger_rows": mi.epoch_counters["trigger_rows"],
        "watermark_ts": mi.epoch_counters["watermark_ts"],
        "num_cpus": bench.NUM_CPUS,
    }))
    ray.shutdown()
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
