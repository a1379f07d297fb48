"""Column-level CDC merge (partial-update coalesce): kernel vs a serial
fold oracle under randomized partial updates / deletes / duplicate and
out-of-order delivery; associativity under arbitrary batch splits (the
combiner property); partition merge counters; engine e2e with the mode
guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from gamechanger_data_ray.core.coalesce import (
    attach_orders,
    coalesce_reduce,
    merge_partition_coalesce,
    strip_transients,
)
from gamechanger_data_ray.core.merge import TOMBS_REP
from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow

PAYLOAD = ("a", "b", "c")


def _table(events: list[dict]) -> pa.Table:
    return pa.table({
        "op": pa.array([e["op"] for e in events], pa.string()),
        "lsn": pa.array([e["lsn"] for e in events], pa.int64()),
        "seq": pa.array([e["seq"] for e in events], pa.int64()),
        "doc_id": pa.array([e["doc_id"] for e in events], pa.string()),
        **{c: pa.array([e.get(c) for e in events], pa.string()) for c in PAYLOAD},
    })


def _oracle(events: list[dict]) -> dict[str, dict]:
    """Serial fold in (lsn, seq) order: non-null cells overwrite, D resets."""
    state: dict[str, dict] = {}
    for e in sorted(events, key=lambda e: (e["lsn"], e["seq"])):
        if e["op"] == "D":
            state.pop(e["doc_id"], None)
        else:
            cur = state.setdefault(e["doc_id"], {})
            for c in PAYLOAD:
                if e.get(c) is not None:
                    cur[c] = e[c]
    return state


def _final(t: pa.Table) -> dict[str, dict]:
    t = strip_transients(t)
    t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
    out = {}
    for row in t.to_pylist():
        out[row["doc_id"]] = {c: row[c] for c in PAYLOAD if row[c] is not None}
    return out


def _rand_events(rng, n, keys, max_lsn=5) -> list[dict]:
    seen = set()
    events = []
    for _ in range(n):
        while True:
            lsn, seq = int(rng.integers(1, max_lsn + 1)), int(rng.integers(0, 1000))
            if (lsn, seq) not in seen:
                seen.add((lsn, seq))
                break
        k = f"k{rng.integers(0, keys)}"
        if rng.random() < 0.15:
            events.append({"op": "D", "lsn": lsn, "seq": seq, "doc_id": k})
        else:
            e = {"op": "U", "lsn": lsn, "seq": seq, "doc_id": k}
            for c in PAYLOAD:
                if rng.random() < 0.5:  # partial image: ~half the columns
                    e[c] = f"{c}@{lsn}.{seq}"
            events.append(e)
    # duplicate deliveries: verbatim re-emits
    for i in rng.integers(0, len(events), size=max(1, n // 10)):
        events.append(dict(events[int(i)]))
    rng.shuffle(events)  # out-of-order delivery
    return events


def test_kernel_matches_serial_fold_randomized():
    rng = np.random.default_rng(0)
    for trial in range(20):
        events = _rand_events(rng, 60, keys=8)
        got = _final(coalesce_reduce(attach_orders(_table(events))))
        assert got == _oracle(events), f"trial {trial}"


def test_reduce_is_associative_over_batch_splits():
    rng = np.random.default_rng(1)
    for trial in range(10):
        events = _rand_events(rng, 50, keys=5)
        whole = coalesce_reduce(attach_orders(_table(events)))
        cut = sorted(rng.choice(len(events) - 1, size=2, replace=False) + 1)
        parts = [events[:cut[0]], events[cut[0]:cut[1]], events[cut[1]:]]
        partials = [coalesce_reduce(attach_orders(_table(p))) for p in parts if p]
        recombined = coalesce_reduce(
            pa.concat_tables(partials, promote_options="default"))
        assert _final(recombined) == _final(whole), f"trial {trial}"
        # weights compose too: total events represented is invariant
        assert (pc.sum(recombined["_events_rep"]).as_py()
                == pc.sum(whole["_events_rep"]).as_py() == len(events))
        # and the reduce is idempotent (a no-op on its own output)
        assert _final(coalesce_reduce(whole)) == _final(whole)


def test_partition_merge_against_state_and_counters():
    state = strip_transients(coalesce_reduce(attach_orders(_table([
        {"op": "I", "lsn": 1, "seq": 0, "doc_id": "x", "a": "a1", "b": "b1", "c": "c1"},
        {"op": "I", "lsn": 1, "seq": 1, "doc_id": "y", "a": "ay"},
    ])))).drop_columns(["_events_rep", "_tombs_rep"])
    events = _table([
        {"op": "U", "lsn": 2, "seq": 0, "doc_id": "x", "b": "b2"},  # partial
        {"op": "D", "lsn": 2, "seq": 1, "doc_id": "y"},
        {"op": "I", "lsn": 2, "seq": 2, "doc_id": "z", "c": "cz"},
    ])
    merged, counters = merge_partition_coalesce(state, events)
    rows = {r["doc_id"]: r for r in merged.to_pylist()}
    # untouched columns survive the partial update
    assert (rows["x"]["a"], rows["x"]["b"], rows["x"]["c"]) == ("a1", "b2", "c1")
    assert "y" not in rows
    assert rows["z"]["c"] == "cz" and rows["z"]["a"] is None
    assert counters["events_in"] == 3 and counters["tombstones"] == 1
    assert counters["upserts"] == 2 and counters["deletes"] == 1
    assert counters["rows_out"] == 2 and counters["watermark_lsn"] == 2


def test_delete_resets_older_partials():
    events = _table([
        {"op": "I", "lsn": 1, "seq": 0, "doc_id": "x", "a": "old", "b": "old"},
        {"op": "D", "lsn": 2, "seq": 0, "doc_id": "x"},
        {"op": "U", "lsn": 3, "seq": 0, "doc_id": "x", "a": "new"},
    ])
    got = _final(coalesce_reduce(attach_orders(events)))
    assert got == {"x": {"a": "new"}}  # b does NOT resurrect through the D


def _engine_events(rows, epoch):
    return pa.table({
        "op": pa.array([r[0] for r in rows], pa.string()),
        "lsn": pa.array(np.full(len(rows), epoch, dtype=np.int64)),
        "seq": pa.array(np.arange(len(rows), dtype=np.int64)),
        "doc_id": pa.array([r[1] for r in rows], pa.string()),
        "tokens": pa.array([r[2] for r in rows], pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[2]) if r[2] is not None else None for r in rows],
                          pa.int32()),
        "source": pa.array([r[3] for r in rows], pa.string()),
    })


def test_engine_e2e_coalesce_mode(tmp_path):
    tb = str(tmp_path / "t")

    def apply(epoch, rows, **kw):
        t = _engine_events(rows, epoch)
        return apply_events_dataset(
            ray.data.from_arrow(t), tb, epoch, t.schema, num_partitions=4,
            update_mode="coalesce", **kw)

    m1 = apply(1, [("I", f"d{i}", [i, i], "s0") for i in range(12)])
    # epoch 2: partial updates — new source only, tokens/n_tok left null
    m2 = apply(2, [("U", f"d{i}", None, "s1") for i in range(0, 12, 2)]
               + [("D", "d3", None, None)])
    assert m2.epoch_counters["update_mode"] == "coalesce"
    # per-column cell-write lineage: the partial epoch patched source on
    # 6 surviving rows; tokens/n_tok cells were NOT rewritten
    assert m2.epoch_counters["cell_writes"] == {"source": 6}
    got = {r["doc_id"]: r for r in table_to_arrow(tb).to_pylist()}
    assert "d3" not in got and len(got) == 11
    assert got["d0"]["source"] == "s1" and got["d0"]["tokens"] == [0, 0]
    assert got["d0"]["n_tok"] == 2  # untouched columns carried through
    assert got["d1"]["source"] == "s0"
    # mode is a table property: replace-mode apply is refused
    t3 = _engine_events([("U", "d1", [9], "s2")], 3)
    with pytest.raises(ValueError, match="update_mode"):
        apply_events_dataset(ray.data.from_arrow(t3), tb, 3, t3.schema,
                             num_partitions=4)
    # and coalesce requires the rewrite policy
    with pytest.raises(ValueError, match="rewrite"):
        apply(4, [("U", "d1", None, "s3")], merge_policy="delta")


def test_e2e_partial_image_soak_matches_oracle(tmp_path):
    """Multi-epoch engine convergence on ~30k PARTIAL events (each update
    writes a random subset of columns; deletes and within-epoch shuffles
    included) against the serial fold oracle — the randomized kernel test
    at engine scale, through the real exchange + commit path."""
    rng = np.random.default_rng(5)
    tb = str(tmp_path / "t")
    all_events: list[dict] = []
    for epoch in (1, 2, 3):
        n = 10_000
        ops = np.where(rng.random(n) < 0.08, "D", "U")
        docs = [f"d{int(k):05d}" for k in rng.integers(0, 4_000, size=n)]
        e = {
            "op": pa.array(ops, pa.string()),
            "lsn": pa.array(np.full(n, epoch, dtype=np.int64)),
            "seq": pa.array(rng.permutation(n).astype(np.int64)),  # shuffled
            "doc_id": pa.array(docs, pa.string()),
        }
        for c in PAYLOAD:
            write = (rng.random(n) < 0.5) & (ops != "D")
            vals = [f"{c}.{epoch}.{i}" if w else None
                    for i, w in enumerate(write)]
            e[c] = pa.array(vals, pa.string())
        t = pa.table(e)
        apply_events_dataset(ray.data.from_arrow(t), tb, epoch, t.schema,
                             num_partitions=8, update_mode="coalesce")
        all_events.extend(t.to_pylist())
    expect = _oracle(all_events)
    got = {}
    for row in table_to_arrow(tb).to_pylist():
        got[row["doc_id"]] = {c: row[c] for c in PAYLOAD if row[c] is not None}
    assert got == expect


def test_incremental_view_over_coalesce_table(tmp_path):
    """Materialized-view maintenance is update-mode-agnostic: the Z-set
    retraction diff works over committed STATES, so a rollup view over a
    coalesce table stays equal to recomputation through partial updates
    that move keys between groups."""
    from gamechanger_data_ray.engine.views import ViewDef, read_view, refresh

    tb, vd = str(tmp_path / "t"), str(tmp_path / "v")
    docs = [f"d{i}" for i in range(12)]
    t1 = _engine_events([("I", d, [1, 2], "s0" if i % 2 else "s1")
                         for i, d in enumerate(docs)], 1)
    apply_events_dataset(ray.data.from_arrow(t1), tb, 1, t1.schema,
                         num_partitions=4, update_mode="coalesce")
    view = ViewDef(["source"], {"sum_tok": "n_tok"})
    refresh(view, vd, tb, num_partitions=2)
    # partial epoch: move d0/d2 to source s2 (tokens untouched), delete d5
    t2 = _engine_events([("U", "d0", None, "s2"), ("U", "d2", None, "s2"),
                         ("D", "d5", None, None)], 2)
    apply_events_dataset(ray.data.from_arrow(t2), tb, 2, t2.schema,
                         num_partitions=4, update_mode="coalesce")
    m = refresh(view, vd, tb, num_partitions=2)
    assert m.epoch_counters["mode"] == "incremental"
    got = {r["source"]: (r["n_rows"], r["sum_tok"])
           for r in read_view(vd).to_pandas().to_dict("records")}
    # recompute oracle from the final state
    state = table_to_arrow(tb).to_pandas()
    expect = {
        src: (len(g), int(g["n_tok"].sum()))
        for src, g in state.groupby("source")
    }
    assert got == expect
    assert got["s2"] == (2, 4)  # moved keys kept their untouched tokens


def test_generator_partial_frac_replay_matches_fold(tmp_path):
    """generate --partial-frac + replay --update-mode coalesce end-to-end:
    the committed table equals a serial per-column fold of every raw
    event (dup deliveries included)."""
    import glob

    import pyarrow.parquet as pq

    from gamechanger_data_ray.core.changelog import write_changelog
    from gamechanger_data_ray.engine.cdc import replay

    cl, tb = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cl, num_epochs=3, events_per_epoch=500, num_keys=120,
                    seed=3, partial_frac=0.6)
    replay(cl, tb, num_partitions=4, update_mode="coalesce")
    payload = ("version_hash", "tokens", "n_tok", "source")
    events = []
    for f in glob.glob(f"{cl}/epoch=*/*.parquet"):
        events.extend(pq.read_table(f).to_pylist())
    state: dict[str, dict] = {}
    for e in sorted(events, key=lambda e: (e["lsn"], e["seq"])):
        if e["op"] == "D":
            state.pop(e["doc_id"], None)
        else:
            cur = state.setdefault(e["doc_id"], {})
            for c in payload:
                if e[c] is not None:
                    cur[c] = tuple(e[c]) if isinstance(e[c], list) else e[c]
    got = {}
    for r in table_to_arrow(tb).to_pylist():
        got[r["doc_id"]] = {
            c: (tuple(r[c]) if isinstance(r[c], list) else r[c])
            for c in payload if r[c] is not None
        }
    assert got == state


def test_replay_full_images_coalesce_equals_replace(tmp_path):
    """On a changelog of FULL row images (the generator's), coalesce and
    replace produce byte-identical state — coalesce strictly generalizes
    LWW. Exercises the fused staged-file path with lifted columns."""
    from gamechanger_data_ray.core.changelog import write_changelog
    from gamechanger_data_ray.engine.cdc import replay

    cl = str(tmp_path / "cl")
    # evolution on: column add (lang@3) + widen (n_tok int64@4) must flow
    # through the lifted representation too
    write_changelog(cl, num_epochs=4, events_per_epoch=600, num_keys=150,
                    evolution=True)
    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    ma = replay(cl, ta, num_partitions=4)
    mb = replay(cl, tb, num_partitions=4, update_mode="coalesce")
    sa, sb = table_to_arrow(ta), table_to_arrow(tb)
    assert sa.schema.names == sb.schema.names
    assert sa.equals(sb)
    for k in ("events_in", "tombstones", "deletes", "rows"):
        assert ma.totals[k] == mb.totals[k]


def _publish_epoch(cl_dir: str, epoch: int, t: pa.Table) -> None:
    import json
    import os

    import pyarrow.parquet as pq

    from gamechanger_data_ray.core.changelog import READY_MARKER, epoch_dir

    d = epoch_dir(cl_dir, epoch)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    with open(os.path.join(d, READY_MARKER), "w") as f:
        json.dump({"epoch": epoch, "files": ["part-00000.parquet"],
                   "events": t.num_rows}, f)


def test_union_replay_cross_source_column_patching(tmp_path):
    """Two producers patch DIFFERENT columns of the same keys in the same
    epoch — union replay under coalesce merges both patches per column
    (the many-crawlers-one-corpus model where each crawler owns a facet)."""
    from gamechanger_data_ray.engine.cdc import replay_union

    a, b, tb = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "tb")
    base = _table([
        {"op": "I", "lsn": 1, "seq": i, "doc_id": f"d{i}",
         "a": f"a{i}", "b": f"b{i}", "c": f"c{i}"} for i in range(6)
    ])
    _publish_epoch(a, 1, base)
    _publish_epoch(b, 1, _table(
        [{"op": "U", "lsn": 1, "seq": 100, "doc_id": "d0", "c": "c0-src-b"}]))
    # epoch 2: source A patches column 'a'; source B patches column 'b'
    _publish_epoch(a, 2, _table(
        [{"op": "U", "lsn": 2, "seq": i, "doc_id": f"d{i}", "a": f"A{i}"}
         for i in range(3)]))
    _publish_epoch(b, 2, _table(
        [{"op": "U", "lsn": 2, "seq": i, "doc_id": f"d{i}", "b": f"B{i}"}
         for i in range(3)]))
    m = replay_union([a, b], tb, num_partitions=4, update_mode="coalesce")
    assert m.epoch == 2  # max appliable epoch, vouched by both sources
    rows = {r["doc_id"]: r for r in table_to_arrow(tb).to_pylist()}
    # both facets landed; untouched column survived
    assert (rows["d0"]["a"], rows["d0"]["b"]) == ("A0", "B0")
    assert rows["d0"]["c"] == "c0-src-b"  # B's epoch-1 patch beat A's insert
    assert (rows["d1"]["a"], rows["d1"]["b"], rows["d1"]["c"]) == ("A1", "B1", "c1")
    assert (rows["d4"]["a"], rows["d4"]["b"], rows["d4"]["c"]) == ("a4", "b4", "c4")


def test_engine_replace_vs_coalesce_differ_on_partials(tmp_path):
    """The same partial-update epoch wipes columns under replace and
    preserves them under coalesce — the semantic the mode guard protects."""
    rows1 = [("I", "k", [1, 2, 3], "src")]
    rows2 = [("U", "k", None, "patched")]
    out = {}
    for mode in ("replace", "coalesce"):
        tb = str(tmp_path / mode)
        for epoch, rows in ((1, rows1), (2, rows2)):
            t = _engine_events(rows, epoch)
            apply_events_dataset(ray.data.from_arrow(t), tb, epoch, t.schema,
                                 num_partitions=2, update_mode=mode)
        out[mode] = table_to_arrow(tb).to_pylist()[0]
    assert out["replace"]["tokens"] is None
    assert out["coalesce"]["tokens"] == [1, 2, 3]
    assert out["replace"]["source"] == out["coalesce"]["source"] == "patched"
