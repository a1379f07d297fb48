"""WAP-branch overhead benchmark — prints ONE JSON line.

Question: what does staging epochs on a branch and publishing them cost
over replaying them straight into the table? Expected answer: the
staged replay costs the same (it IS the same code over the same data,
into a different directory), and fork + publish add only manifest work
— O(partitions) JSON, no data bytes — so the overhead is a constant,
not a function of data volume. That constant is the price of the audit
window.

Protocol (interleaved rounds, CLAUDE.md rule): each round replays the
SAME changelog prefix into fresh tables, then applies the same tail
epochs (a) directly and (b) fork → staged replay → publish, back to
back. Reported: per-phase minima across rounds.

Env: RAY_GRAFT_CPUS (default 32), GRAFT_WAP_EVENTS per epoch (default
300000), GRAFT_WAP_ROUNDS (default 2).

Usage: python scripts/bench_wap.py  (owns its Ray session)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(os.environ.get("GRAFT_WAP_EVENTS", "300000"))
ROUNDS = int(os.environ.get("GRAFT_WAP_ROUNDS", "2"))
KEYS = EVENTS // 6
EPOCHS, BASE = 6, 3
PARTS = 32


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    from gamechanger_data_ray.core.changelog import write_changelog
    from gamechanger_data_ray.engine.branches import (
        branch_create,
        branch_path,
        branch_publish,
    )
    from gamechanger_data_ray.engine.cdc import replay
    from gamechanger_data_ray.engine.maintenance import table_checksums

    root = "/tmp/gcdr_bench_wap"
    shutil.rmtree(root, ignore_errors=True)
    cd = os.path.join(root, "cl")
    write_changelog(cd, num_epochs=EPOCHS, events_per_epoch=EVENTS,
                    num_keys=KEYS, seed=17, zipf_a=1.3)

    best: dict[str, float] = {}
    digests = set()
    for r in range(ROUNDS):
        for mode in ("direct", "wap"):
            td = os.path.join(root, f"{mode}{r}")
            replay(cd, td, num_partitions=PARTS, up_to_epoch=BASE)
            if mode == "direct":
                t0 = time.perf_counter()
                replay(cd, td, num_partitions=PARTS)
                t = time.perf_counter() - t0
                best["direct_tail"] = min(best.get("direct_tail", 9e9), t)
            else:
                t0 = time.perf_counter()
                branch_create(td, "stage")
                t1 = time.perf_counter()
                replay(cd, branch_path(td, "stage"), num_partitions=PARTS)
                t2 = time.perf_counter()
                branch_publish(td, "stage")
                t3 = time.perf_counter()
                best["fork"] = min(best.get("fork", 9e9), t1 - t0)
                best["staged_tail"] = min(best.get("staged_tail", 9e9), t2 - t1)
                best["publish"] = min(best.get("publish", 9e9), t3 - t2)
            digests.add(table_checksums(td)["digest"])

    assert len(digests) == 1, f"direct and WAP states diverged: {digests}"
    overhead = best["fork"] + best["publish"]
    print(json.dumps({
        "metric": "wap_branch_overhead",
        "events_per_epoch": EVENTS, "tail_epochs": EPOCHS - BASE,
        "num_partitions": PARTS, "rounds": ROUNDS,
        "direct_tail_sec": round(best["direct_tail"], 3),
        "staged_tail_sec": round(best["staged_tail"], 3),
        "fork_sec": round(best["fork"], 3),
        "publish_sec": round(best["publish"], 3),
        "fork_plus_publish_sec": round(overhead, 3),
        "overhead_vs_direct": round(overhead / best["direct_tail"], 3),
        "states_identical": True,
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
