"""Round-3 hardening regressions (ADVICE.md): repartition preserves the
table's update_mode; predicate pushdown over schema-evolved file
generations; injective checksum serialization; typed-key view lookups
route like the fold; numeric tag names are rejected as ambiguous."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import (
    apply_events_dataset,
    read_table,
    table_to_arrow,
)
from gamechanger_data_ray.engine.maintenance import (
    repartition_table,
    resolve_tag,
    table_checksums,
    tag,
)
from gamechanger_data_ray.state import manifest as mf


def _events(rows, payload=("a", "b")):
    """rows: (op, lsn, seq, doc_id, *payload)"""
    cols = list(zip(*rows))
    t = {
        "op": pa.array(cols[0], pa.string()),
        "lsn": pa.array(cols[1], pa.int64()),
        "seq": pa.array(cols[2], pa.int64()),
        "doc_id": pa.array(cols[3], pa.string()),
    }
    for i, c in enumerate(payload):
        t[c] = pa.array(cols[4 + i], pa.string())
    return pa.table(t)


# ---------------------------------------------------------------------------
# 1. repartition_table must carry the source table's update_mode
# ---------------------------------------------------------------------------

def test_repartition_preserves_coalesce_mode(tmp_path):
    td, out = str(tmp_path / "tb"), str(tmp_path / "tb7")
    e1 = _events([
        ("I", 1, 0, "d1", "x", "y"),
        ("I", 1, 1, "d2", "p", "q"),
    ])
    apply_events_dataset(ray.data.from_arrow(e1), td, 1, e1.schema,
                         num_partitions=4, update_mode="coalesce")
    # partial update: b=None must coalesce (keep "y"), not null-wipe
    e2 = _events([("U", 2, 0, "d1", "x2", None)])
    apply_events_dataset(ray.data.from_arrow(e2), td, 2, e2.schema,
                         num_partitions=4, update_mode="coalesce")

    m = repartition_table(td, out, new_partitions=7)
    assert m.epoch_counters.get("update_mode") == "coalesce"
    # state survives the rewrite bit-for-bit
    assert (table_checksums(td)["digest"]
            == table_checksums(out)["digest"])

    # and the repartitioned table still ACCEPTS coalesce replays (before
    # the fix it was stamped 'replace' and raised a mode mismatch)...
    e3 = _events([("U", 3, 0, "d2", None, "q3")])
    assert apply_events_dataset(
        ray.data.from_arrow(e3), out, 3, e3.schema,
        update_mode="coalesce") is not None
    rows = {r["doc_id"]: (r["a"], r["b"])
            for r in table_to_arrow(out).to_pylist()}
    assert rows["d1"] == ("x2", "y")   # coalesced, not wiped
    assert rows["d2"] == ("p", "q3")

    # ...and REJECTS replace-mode applies (which would null-wipe)
    with pytest.raises(ValueError, match="update_mode"):
        apply_events_dataset(ray.data.from_arrow(e3), out, 4, e3.schema,
                             update_mode="replace")


# ---------------------------------------------------------------------------
# 2. predicate on an evolved column over pre-evolution file generations
# ---------------------------------------------------------------------------

def test_predicate_on_evolved_column_over_old_files(tmp_path):
    td = str(tmp_path / "tb")
    # epoch 1: many keys, no 'lang' column — all partition files lack it
    e1 = _events([("I", 1, i, f"d{i}", f"v{i}", "z") for i in range(40)])
    apply_events_dataset(ray.data.from_arrow(e1), td, 1, e1.schema,
                         num_partitions=8)
    # epoch 2: ONE key adds the evolved 'lang' column — only its partition
    # is rewritten; the other 7 partitions keep pre-evolution files
    e2 = pa.table({
        "op": pa.array(["U"]), "lsn": pa.array([2], pa.int64()),
        "seq": pa.array([0], pa.int64()), "doc_id": pa.array(["d0"]),
        "a": pa.array(["v0b"]), "b": pa.array(["z"]),
        "lang": pa.array(["en"]),
    })
    apply_events_dataset(ray.data.from_arrow(e2), td, 2, e2.schema)

    # predicate referencing the evolved column: old-generation files must
    # null-exclude, not crash the pyarrow scan
    got = read_table(td, predicate=pc.field("lang") == "en").to_pandas()
    assert list(got["doc_id"]) == ["d0"]

    # same with a projection that EXCLUDES the predicate column
    got2 = read_table(td, columns=["doc_id", "a"],
                      predicate=pc.field("lang") == "en").to_pandas()
    assert list(got2["doc_id"]) == ["d0"] and list(got2.columns) == ["doc_id", "a"]
    # and a predicate that matches nothing
    assert read_table(td, predicate=pc.field("lang") == "xx").count() == 0


# ---------------------------------------------------------------------------
# 3. checksum serialization is injective
# ---------------------------------------------------------------------------

def _one_row_table(tmp_path, name, a, b):
    td = str(tmp_path / name)
    t = pa.table({
        "op": pa.array(["I"]), "lsn": pa.array([1], pa.int64()),
        "seq": pa.array([0], pa.int64()), "doc_id": pa.array(["k"]),
        "a": pa.array([a], pa.string()), "b": pa.array([b], pa.string()),
    })
    apply_events_dataset(ray.data.from_arrow(t), td, 1, t.schema,
                         num_partitions=2)
    return table_checksums(td)["digest"]


def test_checksum_null_vs_nul_byte_distinct(tmp_path):
    # a literal "\x00" string used to serialize identically to NULL
    d_null = _one_row_table(tmp_path, "t1", None, "v")
    d_nul = _one_row_table(tmp_path, "t2", "\x00", "v")
    assert d_null != d_nul


def test_checksum_separator_shift_distinct(tmp_path):
    # "\x1f" inside a value used to shift field boundaries:
    # ("x\x1fy", "z") and ("x", "y\x1fz") joined identically
    d1 = _one_row_table(tmp_path, "t3", "x\x1fy", "z")
    d2 = _one_row_table(tmp_path, "t4", "x", "y\x1fz")
    assert d1 != d2


# ---------------------------------------------------------------------------
# 4. lookup_terms routes typed (non-string) keys like the fold did
# ---------------------------------------------------------------------------

def test_lookup_terms_int_keyed_view(tmp_path):
    from gamechanger_data_ray.engine.views import ViewDef, refresh, lookup_terms

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    n = 50
    t = pa.table({
        "op": pa.array(["I"] * n), "lsn": pa.array([1] * n, pa.int64()),
        "seq": pa.array(list(range(n)), pa.int64()),
        "doc_id": pa.array([f"d{i}" for i in range(n)]),
        "bucket": pa.array([i % 10 for i in range(n)], pa.int64()),
        "n_tok": pa.array([i for i in range(n)], pa.int64()),
    })
    apply_events_dataset(ray.data.from_arrow(t), tb, 1, t.schema,
                         num_partitions=4)
    refresh(ViewDef(["bucket"], {"sum_tok": "n_tok"}), vd, tb,
            num_partitions=8)
    # every int key must be found (mis-routed hashing returned empty)
    for k in range(10):
        got = lookup_terms(vd, [k])
        assert got.num_rows == 1, f"bucket {k} missing"
        assert got["sum_tok"][0].as_py() == sum(
            i for i in range(n) if i % 10 == k)


# ---------------------------------------------------------------------------
# 5. numeric tag names are ambiguous epoch selectors — rejected
# ---------------------------------------------------------------------------

def test_numeric_tag_name_rejected(tmp_path):
    td = str(tmp_path / "tb")
    e1 = _events([("I", 1, 0, "d1", "x", "y")])
    apply_events_dataset(ray.data.from_arrow(e1), td, 1, e1.schema,
                         num_partitions=2)
    with pytest.raises(ValueError, match="numeric"):
        tag(td, "2024")
    tag(td, "release-2024")  # non-numeric fine
    assert resolve_tag(td, "release-2024") == 1
