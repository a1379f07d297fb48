"""Transform views (MAP-then-AGGREGATE incremental maintenance) — the
inverted-index case: documents explode into (term, doc_id) postings rows
whose Z-set signs keep the index exact through inserts, updates and
deletes, at O(changed docs) per refresh."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.views import (
    ViewDef,
    inverted_index_view,
    refresh,
    view_to_arrow,
)


def _events(rows: list[tuple]) -> pa.Table:
    op, lsn, seq, doc, text = zip(*rows)
    return pa.table(
        {
            "op": pa.array(op, pa.string()),
            "lsn": pa.array(lsn, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(doc, pa.string()),
            "text": pa.array(text, pa.string()),
        }
    )


def _oracle_postings(tb: str) -> dict[tuple[str, str], int]:
    """(term, doc_id) -> tf recomputed from the final table state."""
    out: Counter = Counter()
    for row in table_to_arrow(tb).to_pylist():
        for term in re.split(r"[^a-z0-9]+", (row["text"] or "").lower()):
            if term:
                out[(term, row["doc_id"])] += 1
    return dict(out)


def _got_postings(vd: str) -> dict[tuple[str, str], int]:
    t = view_to_arrow(vd)
    return {
        (r["term"], r["doc_id"]): r["n_rows"] for r in t.to_pylist()
    }


def test_inverted_index_full_build(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([
        ("I", 1, 0, "d1", "alpha beta beta gamma"),
        ("I", 1, 1, "d2", "beta delta"),
        ("I", 1, 2, "d3", "Alpha, ALPHA! epsilon"),
    ])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    m = refresh(inverted_index_view(), vd, tb, num_partitions=4)
    assert m is not None and m.epoch_counters["mode"] == "full"
    got = _got_postings(vd)
    assert got == _oracle_postings(tb)
    assert got[("beta", "d1")] == 2      # term frequency is n_rows
    assert got[("alpha", "d3")] == 2     # case folded


def test_inverted_index_incremental_update_and_delete(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([
        ("I", 1, 0, "d1", "alpha beta beta gamma"),
        ("I", 1, 1, "d2", "beta delta"),
    ])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    view = inverted_index_view()
    refresh(view, vd, tb, num_partitions=4)

    # update d1 (old terms must retract), delete d2 (all its terms go)
    e2 = _events([
        ("U", 2, 0, "d1", "gamma zeta"),
        ("D", 2, 1, "d2", None),
    ])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    m = refresh(view, vd, tb)
    assert m is not None and m.epoch_counters["mode"] == "incremental"
    got = _got_postings(vd)
    assert got == _oracle_postings(tb)
    assert ("alpha", "d1") not in got    # retracted by the update
    assert ("beta", "d2") not in got     # retracted by the delete
    assert got[("zeta", "d1")] == 1


def test_incremental_equals_fresh_rebuild(tmp_path):
    tb = str(tmp_path / "tb")
    e1 = _events([("I", 1, i, f"d{i}", f"w{i % 3} common text{i % 5}")
                  for i in range(30)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    vd_inc = str(tmp_path / "v_inc")
    view = inverted_index_view()
    refresh(view, vd_inc, tb, num_partitions=4)
    e2 = _events([("U", 2, 0, "d0", "fresh words"), ("D", 2, 1, "d1", None)])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    refresh(view, vd_inc, tb)
    vd_full = str(tmp_path / "v_full")
    refresh(inverted_index_view(), vd_full, tb, num_partitions=4)
    assert view_to_arrow(vd_inc).equals(view_to_arrow(vd_full))


def test_df_stacks_as_plain_view_over_index(tmp_path):
    """Per-term document frequency = GROUP BY term over the postings —
    computable as a plain groupby read of the index view."""
    import pyarrow.compute as pc

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([
        ("I", 1, 0, "d1", "alpha beta"),
        ("I", 1, 1, "d2", "beta"),
        ("I", 1, 2, "d3", "beta gamma"),
    ])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    refresh(inverted_index_view(), vd, tb, num_partitions=4)
    t = view_to_arrow(vd)
    df = t.group_by("term").aggregate([("doc_id", "count_distinct")])
    dfd = dict(zip(df["term"].to_pylist(), df["doc_id_count_distinct"].to_pylist()))
    assert dfd == {"alpha": 1, "beta": 3, "gamma": 1}


def test_lookup_terms_reads_postings(tmp_path):
    from gamechanger_data_ray.engine.views import lookup_terms

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([
        ("I", 1, 0, "d1", "alpha beta beta"),
        ("I", 1, 1, "d2", "beta delta"),
        ("I", 1, 2, "d3", "gamma"),
    ])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    refresh(inverted_index_view(), vd, tb, num_partitions=4)
    got = lookup_terms(vd, ["beta", "nosuchterm"])
    rows = {(r["term"], r["doc_id"]): r["n_rows"] for r in got.to_pylist()}
    assert rows == {("beta", "d1"): 2, ("beta", "d2"): 1}


def test_transform_signature_guard(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([("I", 1, 0, "d1", "alpha")])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=2)
    refresh(inverted_index_view(), vd, tb, num_partitions=2)
    e2 = _events([("I", 2, 0, "d2", "beta")])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=2)
    changed = inverted_index_view()
    changed.transform_id = "inverted-index-v2"
    with pytest.raises(ValueError, match="definition changed"):
        refresh(changed, vd, tb)


def test_transform_requires_id_and_columns():
    with pytest.raises(ValueError, match="transform_id"):
        ViewDef(["t"], transform=lambda b: b, source_columns=["x"])
    with pytest.raises(ValueError, match="source_columns"):
        ViewDef(["t"], transform=lambda b: b, transform_id="x")
