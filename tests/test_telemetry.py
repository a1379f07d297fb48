"""Committed distribution telemetry (round 5): per-partition KLL
sketches ride every commit, epoch quantiles come from the manifest
alone (±ε vs the data), MOR stacks are marked approximate until a
physical rewrite re-exacts them, history survives data vacuum, and the
CLI verb round-trips."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset
from gamechanger_data_ray.engine.telemetry import (
    epoch_quantiles,
    quantile_drift,
    quantile_history,
)

EPS = 0.05  # k=48 manifest sketches: looser than the k=200 pipeline bound


def _events(n, lsn0=0, mean_tok=50, seed=0, prefix="d"):
    rng = np.random.default_rng(seed)
    lens = rng.integers(mean_tok // 2, mean_tok * 2, n).astype(np.int64)
    offs = np.concatenate([[0], lens.cumsum()])
    vals = rng.integers(0, 50257, int(lens.sum())).astype(np.int32)
    toks = pa.ListArray.from_arrays(
        pa.array(offs, pa.int64()).cast(pa.int32()), pa.array(vals))
    return pa.table({
        "op": pa.array(["I"] * n),
        "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "doc_id": pa.array([f"{prefix}{i}" for i in range(n)]),
        "tokens": toks,
        "n_tok": pa.array(lens.astype(np.int32)),
        "source": pa.array(["s"] * n),
    })


def _rank_ok(data, got, q, eps=EPS):
    lo, hi = (data < got).sum(), (data <= got).sum()
    target = q * len(data)
    if lo <= target <= hi:
        return True
    return min(abs(target - lo), abs(target - hi)) / len(data) <= eps


def test_sketch_rides_commit_and_matches_data(ray_session, tmp_path):
    tb = str(tmp_path / "tb")
    e = _events(4000, mean_tok=64, seed=1)
    apply_events_dataset(ray.data.from_arrow(e), tb, 1, e.schema,
                         num_partitions=8)
    out = epoch_quantiles(tb)
    assert out["epoch"] == 1 and not out["mor_approx"]
    stats = out["columns"]["n_tok"]
    data = e["n_tok"].to_numpy()
    assert stats["n"] == 4000
    for q in (0.5, 0.9, 0.99):
        assert _rank_ok(data, stats[f"p{int(q*100)}"], q)


def test_history_and_drift_from_metadata_only(ray_session, tmp_path):
    """Three epochs with a deliberate length collapse in the third; the
    trajectory and the drift verdict come from manifests alone — proven
    by reading them AFTER the data files are deleted."""
    import shutil

    tb = str(tmp_path / "tb")
    for ep, mean in ((1, 64), (2, 64), (3, 16)):  # epoch 3: collapse
        e = _events(2000, lsn0=ep * 100_000, mean_tok=mean, seed=ep)
        apply_events_dataset(ray.data.from_arrow(e), tb, ep, e.schema,
                             num_partitions=4)
    hist = quantile_history(tb, "n_tok")
    assert [h["epoch"] for h in hist] == [1, 2, 3]
    assert hist[2]["p50"] < hist[0]["p50"] / 2  # the collapse is visible

    drift = quantile_drift(tb, 2, 3, column="n_tok")
    assert drift["relative_shift"]["p50"] < -0.5

    # metadata-only: nuke every data file, telemetry still answers
    for root, _, files in os.walk(tb):
        for f in files:
            if f.endswith(".parquet"):
                os.unlink(os.path.join(root, f))
    hist2 = quantile_history(tb, "n_tok")
    assert hist2 == hist


def test_mor_marks_approx_and_rewrite_re_exacts(ray_session, tmp_path):
    from gamechanger_data_ray.engine.maintenance import compact

    tb = str(tmp_path / "tb")
    e1 = _events(3000, mean_tok=64, seed=4)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=4)
    # delta commit on top (merge-on-read)
    e2 = _events(500, lsn0=10_000, mean_tok=64, seed=5)
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema,
                         num_partitions=4, merge_policy="delta")
    out = epoch_quantiles(tb)
    assert out["mor_approx"] is True
    # overwritten rows are over-weighted, but n is bounded by the union
    assert out["columns"]["n_tok"]["n"] >= 3000

    assert compact(tb) is not None
    out2 = epoch_quantiles(tb)
    assert out2["mor_approx"] is False
    # exact again: n equals the resolved live row count
    from gamechanger_data_ray.state import manifest as mf

    cur = mf.load_current(tb)
    assert out2["columns"]["n_tok"]["n"] == cur.totals["rows"]


def test_restamp_refreshes_sketches(ray_session, tmp_path):
    from gamechanger_data_ray.engine.maintenance import restamp_stats

    tb = str(tmp_path / "tb")
    e = _events(1000, mean_tok=32, seed=7)
    apply_events_dataset(ray.data.from_arrow(e), tb, 1, e.schema,
                         num_partitions=4)
    before = epoch_quantiles(tb)["columns"]["n_tok"]
    assert restamp_stats(tb) is not None
    after = epoch_quantiles(tb)["columns"]["n_tok"]
    assert after["n"] == before["n"]
    data = e["n_tok"].to_numpy()
    for q in (0.5, 0.9):
        assert _rank_ok(data, after[f"p{int(q*100)}"], q)


def test_cli_quantiles_verb(ray_session, tmp_path):
    tb = str(tmp_path / "tb")
    e = _events(1500, mean_tok=48, seed=9)
    apply_events_dataset(ray.data.from_arrow(e), tb, 1, e.schema,
                         num_partitions=4)

    def run(*argv):
        out = subprocess.run(
            [sys.executable, "-m", "gamechanger_data_ray", *argv],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ, "RAY_ADDRESS": "local"},
        )
        assert out.returncode == 0, out.stderr[-800:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    head = run("quantiles", "--table", tb)
    assert head["columns"]["n_tok"]["n"] == 1500
    hist = run("quantiles", "--table", tb, "--history")
    assert hist[0]["epoch"] == 1


def test_drift_gate_quarantines_collapsed_epoch(ray_session, tmp_path):
    """The distribution-drift ingest screen (mode='drift'): an epoch
    whose token lengths collapse vs the committed distribution is
    quarantined WHOLESALE with the drift reason; a same-shape epoch
    passes untouched; a fresh table (no committed sketch) always
    passes; readmit recovers the refused epoch after inspection."""
    from gamechanger_data_ray.engine.ingest_gate import (
        apply_with_neardup_gate,
        read_quarantine,
        readmit,
    )
    from gamechanger_data_ray.state import manifest as mf

    tb = str(tmp_path / "tb")

    # fresh table: drift mode must pass (nothing to defend yet)
    e1 = _events(2000, mean_tok=64, seed=21)
    r1 = apply_with_neardup_gate(
        ray.data.from_arrow(e1), tb, None, 1, e1.schema,
        num_partitions=4, mode="drift")
    assert r1["suppressed"] == 0 and r1["applied"] == 2000

    # same-shape epoch: passes
    e2 = _events(1000, lsn0=100_000, mean_tok=64, seed=22)
    r2 = apply_with_neardup_gate(
        ray.data.from_arrow(e2), tb, None, 2, e2.schema,
        num_partitions=4, mode="drift")
    assert r2["suppressed"] == 0

    # collapsed epoch (mean 8 vs 64): refused wholesale
    e3 = _events(1000, lsn0=200_000, mean_tok=8, seed=23, prefix="x")
    r3 = apply_with_neardup_gate(
        ray.data.from_arrow(e3), tb, None, 3, e3.schema,
        num_partitions=4, mode="drift", max_drift=0.5)
    assert r3["suppressed"] == 1000 and r3["applied"] == 0
    q = read_quarantine(tb, 3)
    reasons = set(q["neardup_of"].to_pylist())
    assert len(reasons) == 1 and "distribution_drift" in next(iter(reasons))

    # table state unchanged by the refused epoch (epoch advanced, rows not)
    cur = mf.load_current(tb)
    assert cur.epoch == 3 and cur.totals["rows"] == 2000

    # operator inspected the crawl, decided it is legitimate → readmit
    out = readmit(tb, 3)
    assert out["readmitted"] == 1000
    assert mf.load_current(tb).totals["rows"] == 3000


def test_drift_gate_chains_first_flag_wins(ray_session, tmp_path):
    """drift,quality chain: when drift refuses the epoch, EVERY payload
    row carries the drift reason (first flag wins) even rows quality
    would also have flagged."""
    from gamechanger_data_ray.engine.ingest_gate import (
        apply_with_neardup_gate,
        read_quarantine,
    )

    tb = str(tmp_path / "tb")
    e1 = _events(1500, mean_tok=64, seed=31)
    apply_with_neardup_gate(ray.data.from_arrow(e1), tb, None, 1, e1.schema,
                            num_partitions=4, mode="quality")
    e2 = _events(800, lsn0=50_000, mean_tok=6, seed=32)  # short AND collapsed
    r = apply_with_neardup_gate(
        ray.data.from_arrow(e2), tb, None, 2, e2.schema,
        num_partitions=4, mode=["drift", "quality"], min_tok=10)
    assert r["suppressed"] == 800
    q = read_quarantine(tb, 2)
    assert all("distribution_drift" in v for v in q["neardup_of"].to_pylist())


def test_autopilot_restamps_mor_sketches(ray_session, tmp_path):
    """A shallow MOR stack (below the compact threshold) leaves
    approximate sketches; autopilot plans a manifest-only restamp,
    applying it re-exacts the sketches, and the replanned list drops
    the signal (fixpoint)."""
    from gamechanger_data_ray.engine import autopilot

    tb = str(tmp_path / "tb")
    e1 = _events(2000, mean_tok=64, seed=41)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=4)
    e2 = _events(300, lsn0=50_000, mean_tok=64, seed=42)
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema,
                         num_partitions=4, merge_policy="delta")
    assert epoch_quantiles(tb)["mor_approx"] is True

    plan = autopilot.plan(tb, max_delta_depth=3)  # 1 delta < threshold
    ops = [a["op"] for a in plan]
    assert "restamp-stats" in ops and "compact" not in ops

    report = autopilot.apply(tb, plan)
    done = {r["op"]: r for r in report}
    assert done["restamp-stats"]["done"] is True
    assert epoch_quantiles(tb)["mor_approx"] is False

    # fixpoint: the signal is gone
    assert "restamp-stats" not in [a["op"] for a in autopilot.plan(
        tb, max_delta_depth=3)]

    # and when the stack IS deep enough, compact subsumes the restamp
    e3 = _events(300, lsn0=90_000, mean_tok=64, seed=43)
    apply_events_dataset(ray.data.from_arrow(e3), tb, 3, e3.schema,
                         num_partitions=4, merge_policy="delta")
    ops3 = [a["op"] for a in autopilot.plan(tb, max_delta_depth=1)]
    assert "compact" in ops3 and "restamp-stats" not in ops3


def test_drift_gate_all_or_nothing_fuzz(ray_session, tmp_path):
    """Seeded walk: whatever the epoch shapes, the drift screen is
    ALL-or-NOTHING per epoch — every payload row admitted, or every one
    quarantined under the single drift reason — and admitted epochs'
    committed totals always equal the serial count of admitted rows."""
    from gamechanger_data_ray.engine.ingest_gate import (
        apply_with_neardup_gate,
        read_quarantine,
    )
    from gamechanger_data_ray.state import manifest as mf

    rng = np.random.default_rng(int(os.environ.get("GRAFT_FUZZ_SEEDS", "77")))
    tb = str(tmp_path / "tb")
    admitted = 0
    for ep in range(1, 7):
        mean = int(rng.choice([64, 64, 64, 8, 200]))
        n = int(rng.integers(300, 900))
        e = _events(n, lsn0=ep * 1_000_000, mean_tok=mean, seed=100 + ep,
                    prefix=f"e{ep}-")
        r = apply_with_neardup_gate(
            ray.data.from_arrow(e), tb, None, ep, e.schema,
            num_partitions=4, mode="drift", max_drift=0.6)
        assert (r["suppressed"], r["applied"]) in ((0, n), (n, 0)), (ep, r)
        if r["applied"]:
            admitted += n
        else:
            q = read_quarantine(tb, ep)
            assert q.num_rows == n
            reasons = set(q["neardup_of"].to_pylist())
            assert len(reasons) == 1
            assert "distribution_drift" in next(iter(reasons))
        assert mf.load_current(tb).totals["rows"] == admitted
