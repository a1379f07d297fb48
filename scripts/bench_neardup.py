"""Maintained near-dup index benchmark — prints ONE JSON line.

Measures the incremental-maintenance economics of
``engine/neardup_index.py`` against the rebuild-per-run alternative:
  1. replay the bench changelog's first 3 epochs into a CDC table
     (per-epoch commits, so the retained-manifest ladder exists);
  2. FULL build: refresh a fresh index dir over the committed state —
     this is what a batch near-dup sweep pays every run;
  3. commit epoch 4, then INCREMENTAL refresh: the view diffs
     state@3 → state@4 and folds only the changed docs' band postings;
  4. for contrast, rebuild a second fresh index over state@4 (what the
     batch path would pay again), and verify incremental == rebuild
     postings via the views' committed totals;
  5. SPARSE-CHURN phase: append a tiny epoch 5 (200 events over 10 doc
     ids) via a symlinked changelog, commit it, and time incremental
     refresh vs a third full rebuild. Epoch 4 dirties EVERY hash
     partition (500k zipf events over 200k keys), so the diff reads
     old+new of the whole corpus and incremental ≈ rebuild; epoch 5
     dirties ~9 of 32 partitions, which is the shape a maintained
     index actually serves (steady-state trickle on a big corpus).

The point at 10^10 docs: the sparse phase moves O(changed partitions ×
2 reads + changed docs × 16 skinny rows), rebuild moves O(corpus).
Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default sf0.1) — sizes
the changelog through bench.py's generator cache.

Usage: python scripts/bench_neardup.py  (owns its Ray session)
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
    from gamechanger_data_ray.engine.neardup_index import neardup_index_view
    from gamechanger_data_ray.engine.views import refresh
    from gamechanger_data_ray.state import manifest as mf

    changelog = bench.ensure_changelog()
    base = f"/tmp/gcdr_bench/neardup_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    tb = f"{base}/tb"
    parts = max(16, bench.NUM_CPUS)

    replay(changelog, tb, num_partitions=parts, up_to_epoch=3,
           epochs_per_commit=1)
    docs_at_3 = mf.load_current(tb).totals["rows"]

    view = neardup_index_view()
    t0 = time.perf_counter()
    m_full = refresh(view, f"{base}/idx", tb, num_partitions=parts)
    full_s = time.perf_counter() - t0
    assert m_full is not None and m_full.epoch_counters["mode"] == "full"

    replay(changelog, tb, num_partitions=parts, up_to_epoch=4)
    docs_at_4 = mf.load_current(tb).totals["rows"]

    t0 = time.perf_counter()
    m_inc = refresh(view, f"{base}/idx", tb, num_partitions=parts)
    inc_s = time.perf_counter() - t0
    assert m_inc is not None and m_inc.epoch_counters["mode"] == "incremental"

    t0 = time.perf_counter()
    m_re = refresh(view, f"{base}/idx2", tb, num_partitions=parts)
    rebuild_s = time.perf_counter() - t0
    assert m_re is not None and m_re.epoch_counters["mode"] == "full"
    assert m_inc.totals.get("rows") == m_re.totals.get("rows"), (
        m_inc.totals, m_re.totals)

    # ---- sparse-churn phase: tiny epoch 5 over a symlinked changelog ----
    import pyarrow.parquet as pq

    from gamechanger_data_ray.core.changelog import (
        READY_MARKER, epoch_dir, generate_epoch_table,
    )

    cl5 = f"{base}/changelog5"
    os.makedirs(cl5, exist_ok=True)
    for e in range(1, 5):
        src = epoch_dir(changelog, e)
        dst = epoch_dir(cl5, e)
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
    m_inc5 = refresh(view, f"{base}/idx", tb, num_partitions=parts)
    inc5_s = time.perf_counter() - t0
    assert m_inc5 is not None and m_inc5.epoch_counters["mode"] == "incremental"
    dirty5 = int(m_inc5.epoch_counters.get("dirty_partitions", -1))

    t0 = time.perf_counter()
    m_re5 = refresh(view, f"{base}/idx3", tb, num_partitions=parts)
    rebuild5_s = time.perf_counter() - t0
    assert m_re5 is not None and m_re5.epoch_counters["mode"] == "full"
    assert m_inc5.totals.get("rows") == m_re5.totals.get("rows"), (
        m_inc5.totals, m_re5.totals)

    print(json.dumps({
        "metric": "neardup_index_refresh",
        "docs_at_build": docs_at_3,
        "docs_at_refresh": docs_at_4,
        "full_build_sec": round(full_s, 3),
        "incremental_refresh_sec": round(inc_s, 3),
        "rebuild_sec": round(rebuild_s, 3),
        "postings": m_inc.totals.get("rows"),
        "speedup_vs_rebuild": round(rebuild_s / inc_s, 2) if inc_s else None,
        "sparse_epoch_events": int(t5.num_rows),
        "sparse_dirty_partitions": dirty5,
        "num_partitions": parts,
        "sparse_incremental_sec": round(inc5_s, 3),
        "sparse_rebuild_sec": round(rebuild5_s, 3),
        "sparse_speedup_vs_rebuild": (
            round(rebuild5_s / inc5_s, 2) if inc5_s else None),
        "sf": bench._sf_name(),
        "num_cpus": bench.NUM_CPUS,
    }))
    shutil.rmtree(base, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
