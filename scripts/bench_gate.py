"""Ingest-gate mode benchmark (exact vs neardup) — prints ONE JSON line.

Protocol (interleaved rounds, CLAUDE.md rule — this VM's throughput
swings 2-3x over minutes, so each round runs BOTH modes back-to-back on
identical inputs and the reported numbers are per-mode minima across
rounds):

  per round, per mode:
  1. commit a deterministic 50k-doc corpus (epoch 1, fresh table dir);
  2. build the mode's maintained index (full refresh);
  3. screen+quarantine+apply+refresh a 5k-event epoch 2 containing 500
     planted EXACT duplicates of committed docs (10%) + 4.5k novel docs,
     via apply_with_neardup_gate(mode=...); screen phase also timed
     standalone.

Both modes must suppress exactly the 500 planted dups (exact dups are
Jaccard 1.0, so the near-dup screen catches them too); the comparison
is COST: the exact mode hashes the epoch and does one routed postings
lookup per batch, the near-dup mode computes MinHash signatures, reads
16 band buckets per doc and point-fetches candidates for the confirm.

Env: RAY_GRAFT_CPUS (default 32), GRAFT_GATE_DOCS / GRAFT_GATE_EVENTS /
GRAFT_GATE_ROUNDS to resize.

Usage: python scripts/bench_gate.py  (owns its Ray session)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("GRAFT_GATE_DOCS", "50000"))
N_EVENTS = int(os.environ.get("GRAFT_GATE_EVENTS", "5000"))
DUP_FRAC = 0.1
ROUNDS = int(os.environ.get("GRAFT_GATE_ROUNDS", "2"))
MEAN_TOKENS = 96


def _corpus_table(n: int):
    """Deterministic (doc_id, tokens) event table: I-ops, epoch 1."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(12345)
    lens = rng.integers(MEAN_TOKENS // 2, MEAN_TOKENS * 3 // 2, size=n)
    flat = rng.integers(0, 30000, size=int(lens.sum()), dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    toks = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    return pa.table({
        "op": pa.array(["I"] * n, pa.string()),
        "lsn": pa.array(np.ones(n, dtype=np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "doc_id": pa.array([f"doc-{i:08d}" for i in range(n)], pa.string()),
        "tokens": toks,
    })


def _epoch2(corpus, n_events: int):
    """Incoming epoch: DUP_FRAC exact copies of committed docs under new
    ids, the rest novel."""
    import numpy as np
    import pyarrow as pa

    n_dup = int(n_events * DUP_FRAC)
    n_new = n_events - n_dup
    rng = np.random.default_rng(777)
    dup_src = rng.choice(len(corpus["doc_id"]), size=n_dup, replace=False)
    dup_toks = corpus["tokens"].take(pa.array(np.sort(dup_src)))
    lens = rng.integers(MEAN_TOKENS // 2, MEAN_TOKENS * 3 // 2, size=n_new)
    flat = rng.integers(0, 30000, size=int(lens.sum()), dtype=np.int32)
    offsets = np.zeros(n_new + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    new_toks = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    n = n_dup + n_new
    return pa.table({
        "op": pa.array(["I"] * n, pa.string()),
        "lsn": pa.array(np.full(n, 2, dtype=np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "doc_id": pa.array(
            [f"dup-{i:06d}" for i in range(n_dup)]
            + [f"new-{i:06d}" for i in range(n_new)], pa.string()),
        "tokens": pa.concat_arrays(
            [dup_toks.combine_chunks() if isinstance(dup_toks, pa.ChunkedArray)
             else dup_toks, new_toks]),
    })


def _run_mode(mode: str, base: str, corpus, epoch2, parts: int) -> dict:
    import ray.data

    from gamechanger_data_ray.engine.cdc import apply_events_dataset
    from gamechanger_data_ray.engine.ingest_gate import (
        _gate_view_def,
        apply_with_neardup_gate,
        screen_events,
    )
    from gamechanger_data_ray.engine.views import refresh

    tb, vd = f"{base}/{mode}/tb", f"{base}/{mode}/idx"
    shutil.rmtree(f"{base}/{mode}", ignore_errors=True)
    t0 = time.perf_counter()
    apply_events_dataset(ray.data.from_arrow(corpus), tb, 1, corpus.schema,
                         num_partitions=parts)
    commit_s = time.perf_counter() - t0
    view = _gate_view_def(mode, k=5, seed=1234, tokens_column="tokens",
                          key_column="doc_id")
    t0 = time.perf_counter()
    refresh(view, vd, tb, num_partitions=parts)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    screen_events(ray.data.from_arrow(epoch2), tb, vd, mode=mode).materialize()
    screen_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = apply_with_neardup_gate(ray.data.from_arrow(epoch2), tb, vd, 2,
                                epoch2.schema, num_partitions=parts, mode=mode)
    gated_s = time.perf_counter() - t0
    return {"corpus_commit_s": round(commit_s, 2),
            "index_build_s": round(build_s, 2),
            "screen_s": round(screen_s, 2),
            "gated_epoch_s": round(gated_s, 2),
            "suppressed": r["suppressed"]}


def main() -> int:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    corpus = _corpus_table(N_DOCS)
    epoch2 = _epoch2(corpus, N_EVENTS)
    base = f"/tmp/gcdr_bench/gate_{os.getpid()}"
    parts = max(16, ncpu)
    best: dict[str, dict] = {}
    for _ in range(ROUNDS):
        for mode in ("exact", "neardup"):
            r = _run_mode(mode, base, corpus, epoch2, parts)
            cur = best.get(mode)
            if cur is None or r["gated_epoch_s"] < cur["gated_epoch_s"]:
                best[mode] = r
    shutil.rmtree(base, ignore_errors=True)
    expected = int(N_EVENTS * DUP_FRAC)
    out = {"metric": "ingest_gate_modes", "docs": N_DOCS, "events": N_EVENTS,
           "planted_dups": expected, "rounds": ROUNDS, "num_cpus": ncpu,
           "exact": best["exact"], "neardup": best["neardup"],
           "both_suppressed_exactly": (best["exact"]["suppressed"] == expected
                                       and best["neardup"]["suppressed"] == expected)}
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
