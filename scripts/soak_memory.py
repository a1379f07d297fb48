"""32M-event soak with memory telemetry (round-5, VERDICT r4 item 7):
run the headline CDC replay at 16x the sf0.1 bench volume while
sampling object-store usage, and report per-phase peaks + spill/restore
byte counters — the evidence that the streaming executor stays far from
the 128 GiB box even at soak volume.

Phases: (1) changelog generation (writes ~16 files/epoch), (2) cold
replay to a fresh table. A sampler thread polls the object store every
0.25 s; spill totals come from Ray's memory summary, which reports
cumulative "Spilled/Restored N MiB" for the session.

Usage:  python scripts/soak_memory.py [events] [num_cpus]
Prints one JSON line per phase + a final summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 32_640_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
NUM_EPOCHS = 4


def spill_stats() -> dict:
    """OS-level store/spill telemetry (no grpc in this sandbox, so the
    cluster memory-summary RPC is unavailable): plasma occupancy = used
    bytes on /dev/shm (Ray's object store is shm-backed on Linux, and
    this box runs nothing else on shm); spill = total bytes currently
    under the session's ray_spilled_objects dir."""
    import glob

    out = {}
    try:
        st = os.statvfs("/dev/shm")
        out["plasma_now_bytes"] = (st.f_blocks - st.f_bfree) * st.f_frsize
    except OSError:
        out["plasma_now_bytes"] = None
    spill = 0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*"):
        for root, _, files in os.walk(d):
            for f in files:
                try:
                    spill += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    out["spill_bytes"] = spill
    return out


class StoreSampler(threading.Thread):
    """Polls plasma occupancy (/dev/shm used bytes) and the live spill
    directory size every 0.5 s, recording peaks."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak = 0.0  # bytes
        self.spill_peak = 0
        self.samples = 0
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            st = spill_stats()
            now = st.get("plasma_now_bytes")
            if now is not None:
                self.peak = max(self.peak, now)
            self.spill_peak = max(self.spill_peak, st.get("spill_bytes", 0))
            self.samples += 1
            time.sleep(0.2)

    def stop(self) -> float:
        self._halt.set()
        self.join(timeout=5)
        return self.peak


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    from gamechanger_data_ray.core.changelog import write_changelog
    from gamechanger_data_ray.engine.cdc import replay

    store_total = ray.cluster_resources().get("object_store_memory", 0.0)
    per_epoch = EVENTS // NUM_EPOCHS
    rows_per_file = max(25_000, per_epoch // 16)
    cl = f"/tmp/gcdr_soak/cl_{EVENTS}"
    tb = f"/tmp/gcdr_soak/tb_{os.getpid()}"
    shutil.rmtree(tb, ignore_errors=True)

    phases = []
    for name, fn in (
        ("generate", lambda: write_changelog(
            cl, num_epochs=NUM_EPOCHS, events_per_epoch=per_epoch,
            num_keys=max(1000, EVENTS // 10), zipf_a=1.3, mean_tokens=96,
            evolution=True, dup_frac=0.02, rows_per_file=rows_per_file)),
        ("replay", lambda: replay(cl, tb,
                                  num_partitions=max(16, NUM_CPUS))),
    ):
        sampler = StoreSampler()
        sampler.start()
        t0 = time.perf_counter()
        result = fn()
        dt = time.perf_counter() - t0
        peak = sampler.stop()
        s1 = spill_stats()
        row = {
            "phase": name,
            "sec": round(dt, 2),
            "events": EVENTS,
            "events_per_sec": round(EVENTS / dt, 1),
            "store_peak_mib": round(peak / 2**20, 1),
            "store_total_gib": round(store_total / 2**30, 2),
            "store_peak_pct": round(100 * peak / store_total, 2)
            if store_total else None,
            "spill_peak_mib": round(sampler.spill_peak / 2**20, 1),
            "spill_end_mib": round(s1.get("spill_bytes", 0) / 2**20, 1),
            "samples": sampler.samples,
        }
        if name == "replay":
            row["rows"] = result.totals.get("rows")
            row["events_in"] = result.totals.get("events_in")
            row["us_per_event"] = round(dt / result.totals["events_in"] * 1e6, 3)
        phases.append(row)
        print(json.dumps(row), flush=True)

    shutil.rmtree(tb, ignore_errors=True)
    print(json.dumps({"summary": phases, "num_cpus": NUM_CPUS}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
