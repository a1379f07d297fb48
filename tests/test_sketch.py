"""HyperLogLog: error bound vs exact distinct, merge associativity, and
the distinct_users_hll query against the DuckDB exact count."""

from __future__ import annotations

import duckdb
import numpy as np

from gamechanger_data_ray.core.sketch import HyperLogLog


def test_hll_error_bound():
    rng = np.random.default_rng(4)
    for true_n in (100, 5_000, 200_000):
        hll = HyperLogLog(p=12)
        vals = rng.integers(0, 2**63, size=true_n, dtype=np.uint64)
        vals = np.unique(vals)
        hll.add_many(vals)
        hll.add_many(vals[: len(vals) // 2])  # duplicates must not inflate
        est = hll.estimate()
        rel = abs(est - len(vals)) / len(vals)
        assert rel < 0.05, f"n={len(vals)}: est {est}, rel err {rel:.3f}"


def test_hll_merge_equals_bulk():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 2**63, size=50_000, dtype=np.uint64)
    whole = HyperLogLog(12)
    whole.add_many(vals)
    parts = [HyperLogLog(12) for _ in range(4)]
    for i, p in enumerate(parts):
        p.add_many(vals[i::4])
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert (merged.registers == whole.registers).all()


def test_distinct_users_hll_close_to_exact(sf_dir):
    from gamechanger_data_ray.pipelines.incremental import distinct_users_hll

    est = int(distinct_users_hll(sf_dir)["approx_distinct_users"].iloc[0])
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_countmin_never_underestimates_and_finds_heavy_hitters():
    from gamechanger_data_ray.core.sketch import CountMin

    rng = np.random.default_rng(6)
    keys = rng.zipf(1.5, size=100_000).astype(np.uint64)
    cm = CountMin()
    cm.add_many(keys)
    uniq, true_counts = np.unique(keys, return_counts=True)
    est = cm.estimate_many(uniq)
    assert (est >= true_counts).all()  # one-sided error only
    # the true top-5 must be within the estimated top-20
    top_true = set(uniq[np.argsort(-true_counts)][:5].tolist())
    top_est = set(uniq[np.argsort(-est)][:20].tolist())
    assert top_true <= top_est


def test_hot_keys_countmin_exact_heavy_hitters(sf_dir):
    """Sketch-prune + exact-verify must equal the plain GROUP BY/HAVING:
    CMS one-sided error makes the prune loss-free, the exact pass drops
    its false positives."""
    from gamechanger_data_ray.pipelines.incremental import hot_keys_countmin

    got = hot_keys_countmin(sf_dir, threshold=70)
    exact = duckdb.sql(
        f"""SELECT user_id, CAST(COUNT(*) AS BIGINT) n_events
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY user_id HAVING COUNT(*) >= 70 ORDER BY user_id"""
    ).df()
    assert len(exact) > 0  # threshold chosen to be non-trivial
    assert list(got["user_id"]) == list(exact["user_id"])
    assert list(got["n_events"]) == list(exact["n_events"])
