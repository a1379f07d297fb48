"""Maintained training-view benchmark — prints ONE JSON line.

Measures the refresh-vs-rebuild economics of
``engine/training_view.py`` on the same changelog the headline bench
uses:

  1. replay the bench changelog's first 4 epochs into a CDC table;
  2. FULL build: first training_view_refresh (packs every partition) —
     what export_training pays on every run;
  3. SPARSE commit: a tiny epoch 5 (200 events over 10 doc ids) lands,
     dirtying only the partitions those ids hash-route to;
  4. INCREMENTAL refresh: re-packs only the dirty buckets;
  5. REBUILD contrast: a fresh view dir over the same head state, and
     verify incremental == rebuild (file names + totals).

At 10^10 docs the sparse refresh moves O(changed partitions) resolve +
pack work; a re-export moves O(corpus). The ratio printed here is the
single-node shadow of that asymptote (at bench scale fixed Ray task
overheads dampen it — the dirty-bucket COUNT is the scale story).

Usage: python scripts/bench_training_view.py  (owns its Ray session)
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
    from gamechanger_data_ray.engine.training_view import training_view_refresh

    changelog = bench.ensure_changelog()
    base = f"/tmp/gcdr_bench/tview_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    tb = f"{base}/tb"
    parts = max(16, bench.NUM_CPUS)

    replay(changelog, tb, num_partitions=parts, up_to_epoch=4)

    t0 = time.perf_counter()
    m_full = training_view_refresh(f"{base}/tv", tb, cap=2048, seed=7)
    full_s = time.perf_counter() - t0
    assert m_full["repacked"] == len(m_full["buckets"])

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
    m_inc = training_view_refresh(f"{base}/tv", tb, cap=2048, seed=7)
    inc_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    m_re = training_view_refresh(f"{base}/tv2", tb, cap=2048, seed=7)
    rebuild_s = time.perf_counter() - t0
    assert {p: b["file"] for p, b in m_inc["buckets"].items()} == \
           {p: b["file"] for p, b in m_re["buckets"].items()}
    assert (m_inc["total_chunks"], m_inc["total_tokens"]) == \
           (m_re["total_chunks"], m_re["total_tokens"])

    # content_sig in action: a merge-on-read commit + compaction is two
    # physical rewrites of ~the same logical state — the view must track
    # the MOR commit (dirty buckets only) and skip the compaction entirely
    t6 = generate_epoch_table(
        6, 200, 10, seed=43, zipf_a=0.0, mean_tokens=96,
        evolution=True, dup_frac=0.0,
    )
    d6 = epoch_dir(cl5, 6)
    os.makedirs(d6, exist_ok=True)
    pq.write_table(t6, os.path.join(d6, "part-00000.parquet"))
    with open(os.path.join(d6, READY_MARKER), "w") as f:
        json.dump({"epoch": 6, "files": ["part-00000.parquet"],
                   "events": t6.num_rows}, f)
    replay(cl5, tb, num_partitions=parts, up_to_epoch=6, merge_policy="delta")
    m_mor = training_view_refresh(f"{base}/tv", tb, cap=2048, seed=7)
    from gamechanger_data_ray.engine.maintenance import compact

    compact(tb)
    t0 = time.perf_counter()
    m_cmp = training_view_refresh(f"{base}/tv", tb, cap=2048, seed=7)
    compact_refresh_s = time.perf_counter() - t0
    assert m_cmp["repacked"] == 0, m_cmp["repacked"]

    print(json.dumps({
        "metric": "training_view_refresh",
        "unit": "sec",
        "full_build_sec": round(full_s, 3),
        "sparse_refresh_sec": round(inc_s, 3),
        "rebuild_sec": round(rebuild_s, 3),
        "speedup_vs_rebuild": round(rebuild_s / max(inc_s, 1e-9), 2),
        "buckets_total": len(m_re["buckets"]),
        "buckets_repacked": m_inc["repacked"],
        "mor_epoch_repacked": m_mor["repacked"],
        "post_compact_repacked": m_cmp["repacked"],
        "post_compact_refresh_sec": round(compact_refresh_s, 3),
        "docs": m_re["docs"],
        "total_tokens": m_re["total_tokens"],
        "total_chunks": m_re["total_chunks"],
        "num_cpus": bench.NUM_CPUS,
    }))
    shutil.rmtree(base, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
