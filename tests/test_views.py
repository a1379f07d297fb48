"""Incremental materialized-view tests: full build == oracle, incremental
refresh == fresh rebuild (byte-identical), group drop-out on deletion,
dirty-partition locality, definition-change rejection, fencing no-op."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.engine.cdc import (
    apply_events_dataset,
    replay,
    table_to_arrow,
)
from gamechanger_data_ray.engine.views import (
    ViewDef,
    read_view,
    refresh,
    view_to_arrow,
)

VIEW = ViewDef(["source"], {"sum_tok": "n_tok"})


@pytest.fixture(scope="module")
def viewed_table(tmp_path_factory):
    """Table replayed to epoch 2 then 4 (schema evolution + deletes in
    between), with a view refreshed at each stop."""
    base = tmp_path_factory.mktemp("views")
    cl, tb, vd = str(base / "cl"), str(base / "tb"), str(base / "view")
    write_changelog(
        cl, num_epochs=4, events_per_epoch=800, num_keys=200,
        zipf_a=1.2, mean_tokens=8, evolution=True, rows_per_file=300,
    )
    replay(cl, tb, num_partitions=8, up_to_epoch=2, epochs_per_commit=1)
    m1 = refresh(VIEW, vd, tb, num_partitions=4)
    replay(cl, tb, num_partitions=8, epochs_per_commit=1)
    m2 = refresh(VIEW, vd, tb)
    return base, tb, vd, m1, m2


def _oracle(tb: str) -> pa.Table:
    df = table_to_arrow(tb).to_pandas()
    exp = (
        df.groupby("source", dropna=False)
        .agg(
            n_rows=("doc_id", "size"),
            sum_tok=("n_tok", lambda s: int(s.fillna(0).sum())),
        )
        .reset_index()
        .sort_values("source", ignore_index=True)
    )
    return pa.table(
        {
            "source": pa.array(exp["source"], pa.string()),
            "n_rows": pa.array(exp["n_rows"], pa.int64()),
            "sum_tok": pa.array(exp["sum_tok"], pa.int64()),
        }
    )


def test_incremental_refresh_matches_oracle(viewed_table):
    _, tb, vd, m1, m2 = viewed_table
    assert m1.epoch_counters["mode"] == "full" and m1.epoch == 2
    assert m2.epoch_counters["mode"] == "incremental" and m2.epoch == 4
    assert view_to_arrow(vd).equals(_oracle(tb))


def test_incremental_equals_fresh_rebuild_byte_identical(viewed_table):
    base, tb, vd, _, _ = viewed_table
    vd2 = str(base / "view_fresh")
    m = refresh(VIEW, vd2, tb, num_partitions=4)
    assert m.epoch_counters["mode"] == "full"
    assert view_to_arrow(vd2).equals(view_to_arrow(vd))


def test_refresh_is_fenced_noop_when_current(viewed_table):
    _, tb, vd, _, _ = viewed_table
    assert refresh(VIEW, vd, tb) is None


def test_read_view_streams_current_state(viewed_table):
    _, tb, vd, _, _ = viewed_table
    ds = read_view(vd)
    assert ds.count() == view_to_arrow(vd).num_rows
    assert set(ds.schema().names) == {"source", "n_rows", "sum_tok"}


def test_definition_change_rejected(viewed_table):
    _, tb, vd, _, _ = viewed_table
    other = ViewDef(["source"], {"total": "n_tok"})
    with pytest.raises(ValueError, match="definition changed"):
        refresh(other, vd, tb)


def _events(rows: list[tuple]) -> pa.Table:
    op, lsn, seq, doc, src, ntok = zip(*rows)
    return pa.table(
        {
            "op": pa.array(op, pa.string()),
            "lsn": pa.array(lsn, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(doc, pa.string()),
            "tokens": pa.array([[1, 2]] * len(rows), pa.list_(pa.int32())),
            "n_tok": pa.array(ntok, pa.int32()),
            "source": pa.array(src, pa.string()),
        }
    )


def test_group_drops_out_when_all_rows_deleted(tmp_path):
    import ray.data

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events(
        [
            ("I", 1, 0, "a1", "x", 10),
            ("I", 1, 1, "a2", "x", 20),
            ("I", 1, 2, "b1", "y", 5),
        ]
    )
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    refresh(VIEW, vd, tb, num_partitions=4)
    assert view_to_arrow(vd)["source"].to_pylist() == ["x", "y"]

    e2 = _events([("D", 2, 0, "a1", None, None), ("D", 2, 1, "a2", None, None)])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    m = refresh(VIEW, vd, tb)
    assert m.epoch_counters["mode"] == "incremental"
    got = view_to_arrow(vd)
    assert got["source"].to_pylist() == ["y"]
    assert got["n_rows"].to_pylist() == [1] and got["sum_tok"].to_pylist() == [5]


def test_single_key_update_dirties_one_view_partition(tmp_path):
    import ray.data

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    srcs = [f"s{i}" for i in range(8)]
    e1 = _events(
        [("I", 1, i, f"d{i}", srcs[i % 8], 10 + i) for i in range(64)]
    )
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    refresh(VIEW, vd, tb, num_partitions=8)
    # update ONE key, same source: only that source's view partition is dirty
    e2 = _events([("U", 2, 0, "d0", "s0", 999)])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    m = refresh(VIEW, vd, tb)
    assert m.epoch_counters["dirty_partitions"] == 1
    got = view_to_arrow(vd).to_pandas().set_index("source")
    assert int(got.loc["s0", "sum_tok"]) == sum(10 + i for i in range(0, 64, 8)) - 10 + 999
    # untouched view partitions carried their files forward un-rewritten
    assert sum(1 for p in m.partitions.values() if "view-e000002" in p["file"]) == 1


def test_null_group_and_null_sum_semantics(tmp_path):
    import ray.data

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events(
        [
            ("I", 1, 0, "a", None, 7),
            ("I", 1, 1, "b", None, None),
            ("I", 1, 2, "c", "z", None),
        ]
    )
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=2)
    refresh(VIEW, vd, tb, num_partitions=2)
    got = view_to_arrow(vd).to_pandas()
    null_grp = got[got["source"].isna()].iloc[0]
    assert int(null_grp["n_rows"]) == 2 and int(null_grp["sum_tok"]) == 7
    z = got[got["source"] == "z"].iloc[0]
    assert int(z["n_rows"]) == 1 and int(z["sum_tok"]) == 0


def test_route_by_placement_lookup_and_guards(tmp_path):
    """route_by views: (a) every group sharing the leading key lands in
    ONE partition (the placement contract lookup pruning relies on),
    (b) lookup_terms over a routed view == over the composed-key view,
    (c) route_by must be a subset of group_by, (d) the signature differs
    so a composed-key view_dir refuses a routed definition."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from gamechanger_data_ray.engine.views import lookup_terms
    from gamechanger_data_ray.state import manifest as mf

    tb = str(tmp_path / "tb")
    rows = [("I", 1, i, f"d{i:02d}", f"s{i % 5}", i) for i in range(40)]
    op, lsn, seq, doc, src, tok = zip(*rows)
    e1 = pa.table({
        "op": pa.array(op), "lsn": pa.array(lsn, pa.int64()),
        "seq": pa.array(seq, pa.int64()), "doc_id": pa.array(doc),
        "source": pa.array(src), "n_tok": pa.array(tok, pa.int64()),
    })
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=4)

    composed = ViewDef(["source", "doc_id"], {"sum_tok": "n_tok"})
    routed = ViewDef(["source", "doc_id"], {"sum_tok": "n_tok"},
                     route_by=["source"])
    assert composed.signature() != routed.signature()

    vc, vr = str(tmp_path / "vc"), str(tmp_path / "vr")
    refresh(composed, vc, tb, num_partitions=4)
    refresh(routed, vr, tb, num_partitions=4)

    # (a) placement: each source value appears in exactly one partition
    cur = mf.load_current(vr)
    seen: dict[str, set[int]] = {}
    for p, ent in cur.partitions.items():
        t = pq.read_table(os.path.join(vr, ent["file"]), columns=["source"])
        for s in set(t["source"].to_pylist()):
            seen.setdefault(s, set()).add(int(p))
    assert all(len(parts) == 1 for parts in seen.values())
    assert len(seen) == 5

    # (b) identical lookup results either way
    got_r = lookup_terms(vr, ["s1", "s3"]).to_pydict()
    got_c = lookup_terms(vc, ["s1", "s3"]).to_pydict()
    assert got_r == got_c and len(got_r["source"]) == 16

    # (c) route_by outside group_by refuses
    with pytest.raises(ValueError, match="subset"):
        ViewDef(["source"], {"sum_tok": "n_tok"}, route_by=["doc_id"])

    # (d) a composed-key view_dir refuses the routed definition
    with pytest.raises(ValueError, match="definition changed"):
        refresh(routed, vc, tb)
