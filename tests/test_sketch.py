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
