"""Z-order vs lexicographic clustering benchmark — prints ONE JSON line.

Question: on a table whose scans filter on TWO independent columns,
what does Morton ordering buy over lexicographic (x, y) ordering?
Measured three ways on the same 2M-row table: (a) the fraction of
parquet row groups whose footer stats overlap a 10%-of-domain bound on
each axis (deterministic — this is what predicate pushdown reads),
(b) wall time of the bounded read through read_table(bounds=...), and
(c) the clustering rewrite cost itself.

Protocol: one table, alternately re-clustered lex → zorder per round
(interleaved, CLAUDE.md rule); scan walls are minima across rounds;
overlap fractions are deterministic per mode.

Env: RAY_GRAFT_CPUS (default 32), GRAFT_Z_ROWS (default 2000000).

Usage: python scripts/bench_zorder.py  (owns its Ray session)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_Z_ROWS", "2000000"))
ROUNDS = int(os.environ.get("GRAFT_Z_ROUNDS", "2"))
PARTS = 16
ROW_GROUP = int(os.environ.get("GRAFT_Z_ROW_GROUP", "4096"))
DOMAIN = 1_000_000
LO, HI = 450_000, 550_000  # 10% slice of either axis


def overlap(table_dir: str, col: str) -> float:
    import pyarrow.parquet as pq

    from gamechanger_data_ray.state import manifest as mf

    cur = mf.load_current(table_dir)
    total = hit = 0
    for e in cur.partitions.values():
        pf = pq.ParquetFile(os.path.join(table_dir, e["file"]))
        sch = pf.metadata.schema
        leaf = [sch.column(j).path for j in range(len(sch))].index(col)
        for i in range(pf.num_row_groups):
            st = pf.metadata.row_group(i).column(leaf).statistics
            total += 1
            hit += not (st.max < LO or st.min > HI)
    return hit / total


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    from gamechanger_data_ray.engine.cdc import bootstrap_table, read_table
    from gamechanger_data_ray.engine.maintenance import cluster_table

    root = "/tmp/gcdr_bench_zorder"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    rng = np.random.default_rng(23)
    x = rng.integers(0, DOMAIN, ROWS)
    y = rng.integers(0, DOMAIN, ROWS)
    snap = os.path.join(root, "snap.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([f"d{i:08d}" for i in range(ROWS)]),
        "tokens": pa.array([[1]] * ROWS, pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(ROWS, np.int32)),
        "source": pa.array(["s"] * ROWS),
        "x": pa.array(x, pa.int64()),
        "y": pa.array(y, pa.int64()),
    }), snap)
    td = os.path.join(root, "tb")
    bootstrap_table(snap, td, num_partitions=PARTS)

    stats: dict[str, float] = {}
    fracs: dict[str, float] = {}
    expect = None
    for _ in range(ROUNDS):
        for mode in ("lex", "zorder"):
            t0 = time.perf_counter()
            m = cluster_table(td, by=["x", "y"], row_group_rows=ROW_GROUP,
                              zorder=(mode == "zorder"))
            assert m is not None
            stats[f"cluster_{mode}"] = min(
                stats.get(f"cluster_{mode}", 9e9), time.perf_counter() - t0)
            fracs[f"{mode}_x"] = overlap(td, "x")
            fracs[f"{mode}_y"] = overlap(td, "y")
            for col in ("x", "y"):
                t0 = time.perf_counter()
                n = read_table(td, bounds={col: (LO, HI)},
                               columns=["doc_id", col]).count()
                stats[f"scan_{col}_{mode}"] = min(
                    stats.get(f"scan_{col}_{mode}", 9e9),
                    time.perf_counter() - t0)
                if expect is None:
                    expect = {}
                expect.setdefault(col, n)
                assert expect[col] == n, f"{mode} {col}: {n} != {expect[col]}"

    print(json.dumps({
        "metric": "zorder_vs_lex",
        "rows": ROWS, "row_group_rows": ROW_GROUP, "partitions": PARTS,
        "bound": "10pct of domain, each axis",
        "rowgroup_overlap": {k: round(v, 3) for k, v in fracs.items()},
        "scan_sec": {k: round(stats[k], 3) for k in stats if k.startswith("scan")},
        "cluster_sec": {k.split("_")[1]: round(stats[k], 3)
                        for k in stats if k.startswith("cluster")},
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
