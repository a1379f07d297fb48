"""Z-order (Morton-interleaved) clustering — maintenance.cluster_table
(zorder=True), the true OPTIMIZE ZORDER shape.

The contrast that justifies it: lexicographic (x, y) ordering makes
row-group stats disjoint on x but leaves y's range wide in EVERY group,
so a predicate on y alone prunes nothing; the Z-curve localizes both, so
single-column bounds on either axis each skip most row groups. Also:
identical logical state (checksums), deterministic rewrite bytes, CLI.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gamechanger_data_ray.engine.cdc import bootstrap_table, table_to_arrow
from gamechanger_data_ray.engine.maintenance import (
    _zorder_values,
    cluster_table,
    table_checksums,
)
from gamechanger_data_ray.state import manifest as mf

N = 4096
ROW_GROUP = 128
PARTS = 2


def _snapshot(path: str) -> None:
    rng = np.random.default_rng(7)
    x = rng.integers(0, 100_000, N)
    y = rng.integers(0, 100_000, N)  # independent of x
    toks = pa.array([[int(v) % 97] for v in x], pa.list_(pa.int32()))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([f"d{i:05d}" for i in range(N)]),
            "tokens": toks,
            "n_tok": pa.array([1] * N, pa.int32()),
            "source": pa.array(["s"] * N),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }),
        path,
    )


def _overlap_fraction(table_dir: str, col: str, lo: int, hi: int) -> float:
    """Fraction of row groups (across all partitions) whose [min,max] on
    ``col`` intersects [lo, hi] — what parquet predicate pushdown reads."""
    cur = mf.load_current(table_dir)
    total = overlapping = 0
    for e in cur.partitions.values():
        pf = pq.ParquetFile(os.path.join(table_dir, e["file"]))
        sch = pf.metadata.schema
        leaf = [sch.column(j).path for j in range(len(sch))].index(col)
        for i in range(pf.num_row_groups):
            st = pf.metadata.row_group(i).column(leaf).statistics
            total += 1
            if not (st.max < lo or st.min > hi):
                overlapping += 1
    assert total >= 16, f"only {total} row groups — test underpowered"
    return overlapping / total


@pytest.fixture(scope="module")
def tables(tmp_path_factory):
    """The SAME bootstrapped snapshot clustered two ways."""
    root = tmp_path_factory.mktemp("zorder")
    snap = str(root / "snap.parquet")
    _snapshot(snap)
    lex, zed = str(root / "lex"), str(root / "zed")
    for td in (lex, zed):
        bootstrap_table(snap, td, num_partitions=PARTS)
    assert cluster_table(lex, by=["x", "y"], row_group_rows=ROW_GROUP) is not None
    mz = cluster_table(zed, by=["x", "y"], row_group_rows=ROW_GROUP, zorder=True)
    assert mz is not None
    return lex, zed, mz


def test_zorder_commits_revision_with_label(tables):
    _, zed, mz = tables
    assert mz.epoch_counters["clustered_by"] == "zorder(x,y)"
    assert mz.rev == 1


def test_zorder_preserves_logical_state(tables):
    lex, zed, _ = tables
    a, b = table_checksums(lex), table_checksums(zed)
    assert a["digest"] == b["digest"] and a["rows"] == b["rows"]
    ta = table_to_arrow(lex).sort_by("doc_id")
    tb = table_to_arrow(zed).sort_by("doc_id")
    assert ta.equals(tb)


def test_zorder_prunes_both_axes_lex_only_one(tables):
    """The headline property. A 10%-of-domain bound per axis:
    lexicographic prunes x hard but reads ~every group for y; z-order
    prunes BOTH axes to a small fraction."""
    lex, zed, _ = tables
    lo, hi = 40_000, 50_000
    lex_x = _overlap_fraction(lex, "x", lo, hi)
    lex_y = _overlap_fraction(lex, "y", lo, hi)
    z_x = _overlap_fraction(zed, "x", lo, hi)
    z_y = _overlap_fraction(zed, "y", lo, hi)
    assert lex_x <= 0.25, f"lexicographic x pruning broken: {lex_x}"
    assert lex_y >= 0.9, f"test premise wrong — lex y should be unprunable: {lex_y}"
    assert z_x <= 0.6 and z_y <= 0.6, (z_x, z_y)
    # and the z-curve beats lexicographic by a wide margin on the y axis
    assert z_y <= lex_y / 2, (z_y, lex_y)


def test_zorder_rewrite_is_deterministic(tables):
    """Re-running the same zorder rewrite writes byte-identical files
    under the same names (idempotent retry contract)."""
    _, zed, mz = tables
    part = max(mz.partitions, key=lambda p: mz.partitions[p]["rows"])
    with open(os.path.join(zed, mz.partitions[part]["file"]), "rb") as f:
        before = f.read()
    m2 = cluster_table(zed, by=["x", "y"], row_group_rows=ROW_GROUP, zorder=True)
    assert m2 is not None and m2.rev == mz.rev + 1
    with open(os.path.join(zed, m2.partitions[part]["file"]), "rb") as f:
        after = f.read()
    assert before == after


def test_zorder_value_kernel_locality():
    """Morton sanity on the kernel itself: points close in BOTH
    coordinates get closer z-ranks than points close in only one."""
    t = pa.table({
        "doc_id": [f"k{i}" for i in range(4)],
        "x": pa.array([0, 1, 0, 100_000], pa.int64()),
        "y": pa.array([0, 1, 100_000, 0], pa.int64()),
    })
    z = _zorder_values(t, ["x", "y"])
    # (0,0) and (1,1) nearly coincide; the two far corners sit far away
    assert abs(int(z[0]) - int(z[1])) < abs(int(z[0]) - int(z[2]))
    assert abs(int(z[0]) - int(z[1])) < abs(int(z[0]) - int(z[3]))


def test_zorder_handles_strings_nulls_constants():
    t = pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "s": pa.array(["zz", None, "aa", "mm"]),
        "c": pa.array([5, 5, 5, 5], pa.int64()),
        "v": pa.array([1.0, None, 3.0, 2.0], pa.float64()),
    })
    z = _zorder_values(t, ["s", "c", "v"])
    assert len(z) == 4 and z.dtype == np.uint64
    # null string ranks lowest (fill ""), constant column contributes 0
    zs = _zorder_values(t, ["s", "c"])
    assert int(zs[1]) == min(int(v) for v in zs)


def test_zorder_axis_monotonicity_property():
    """Hypothesis: with every other column held fixed, z is monotone in
    each single column's value — the curve never inverts an axis."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        vals=st.lists(st.integers(0, 10**9), min_size=2, max_size=50),
        other=st.integers(0, 10**9),
        axis=st.sampled_from(["x", "y"]),
    )
    def prop(vals, other, axis):
        n = len(vals)
        t = pa.table({
            "doc_id": [f"k{i}" for i in range(n)],
            "x": pa.array(vals if axis == "x" else [other] * n, pa.int64()),
            "y": pa.array(vals if axis == "y" else [other] * n, pa.int64()),
        })
        z = _zorder_values(t, ["x", "y"])
        order_by_val = np.argsort(np.asarray(vals), kind="stable")
        z_sorted = z[order_by_val]
        assert np.all(np.diff(z_sorted.astype(np.int64)) >= 0), (
            vals, other, axis, z.tolist())

    prop()


def test_zorder_guards(tables):
    lex, _, _ = tables
    with pytest.raises(ValueError, match="2-4 columns"):
        cluster_table(lex, by="x", zorder=True)
    with pytest.raises(ValueError, match="2-4 columns"):
        cluster_table(lex, by=["x", "y", "n_tok", "source", "doc_id"],
                      zorder=True)


def test_zorder_cli(tables, capsys):
    import json

    from gamechanger_data_ray.__main__ import main

    lex, _, _ = tables
    assert main(["cluster", "--table", lex, "--by", "x,y", "--zorder",
                 "--row-group-rows", str(ROW_GROUP)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["clustered"] is True and out["by"] == "zorder(x,y)"
