"""Driver simulation: run every registered query at a given sf against its
oracle SQL, mirroring the grading driver's rows/schema/value check.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
Prints one JSON line per query plus a summary; exit 1 on any failure.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    import __ray_entry__ as E
    from tests.util_oracle import duck_con, normalize, to_df

    import pandas as pd

    q, o = E.queries(), E.oracle_sql()
    con = duck_con(sf_dir)
    failures = []
    for name, fn in q.items():
        if only and name not in only:
            continue
        row: dict = {"q": name}
        t0 = time.perf_counter()
        try:
            mine = normalize(to_df(fn(sf_dir)))
            row["rows"] = len(mine)
            if name in o:
                oracle = normalize(con.sql(o[name]).df())
                row["oracle_rows"] = len(oracle)
                row["rows_match"] = len(mine) == len(oracle)
                row["schema_match"] = list(mine.columns) == list(oracle.columns)
                if row["rows_match"] and row["schema_match"]:
                    try:
                        pd.testing.assert_frame_equal(
                            mine, oracle, check_dtype=False, check_exact=False, rtol=1e-5)
                        row["hash_match"] = True
                    except AssertionError as e:
                        row["hash_match"] = False
                        row["err"] = str(e).split("\n")[0][:200]
                else:
                    row["hash_match"] = False
            else:
                row["oracle"] = "none (rows-only)"
        except Exception:
            row["err"] = traceback.format_exc().strip().split("\n")[-1][:300]
        row["sec"] = round(time.perf_counter() - t0, 2)
        ok = row.get("hash_match", "err" not in row)
        if not ok:
            failures.append(name)
        print(json.dumps(row), flush=True)

    print(json.dumps({"summary": True, "total": len(q if not only else only),
                      "failures": failures}), flush=True)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
