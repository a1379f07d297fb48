"""Incrementally-maintained MinHash-LSH near-dup index
(engine/neardup_index.py): band postings exactness vs a serial
recompute, near-dup search with exact-Jaccard confirm over the
committed state, and the index tracking updates/deletes through
incremental refreshes without a rebuild."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset, table_to_arrow
from gamechanger_data_ray.engine.neardup_index import (
    _band_buckets,
    neardup_index_view,
    neardup_search,
)
from gamechanger_data_ray.engine.views import refresh, view_to_arrow
from gamechanger_data_ray.stages.dedup import TokenMinHasher, token_shingle_jaccard

K = 5


def _tokens(seed: int, n: int = 60) -> list[int]:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 50, size=n).astype(int).tolist()


def _near(base: list[int], flips: int, seed: int) -> list[int]:
    """A near-duplicate: same stream with `flips` positions changed."""
    rng = np.random.default_rng(seed)
    out = list(base)
    for i in rng.choice(len(out), size=flips, replace=False):
        out[int(i)] = int(out[int(i)]) + 1000
    return out


def _events(rows):
    op, lsn, seq, doc, toks = zip(*rows)
    return pa.table(
        {
            "op": pa.array(op, pa.string()),
            "lsn": pa.array(lsn, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(doc, pa.string()),
            "tokens": pa.array(
                [list(t) if t is not None else None for t in toks],
                pa.list_(pa.int32())),
        }
    )


def _oracle_postings(tb: str) -> set[tuple[int, str]]:
    t = table_to_arrow(tb)
    toks = t["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    t = t.filter(toks.is_valid())
    hasher = TokenMinHasher(k=K)
    buckets = _band_buckets(hasher, t["tokens"])
    ids = t["doc_id"].to_pylist()
    return {(int(b), ids[i]) for i in range(len(ids)) for b in buckets[i]}


def test_neardup_postings_and_incremental_maintenance(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(30)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    view = neardup_index_view(k=K)
    m = refresh(view, vd, tb, num_partitions=4)
    assert m is not None and m.epoch_counters["mode"] == "full"
    got = {(r["bucket"], r["doc_id"]) for r in view_to_arrow(vd).to_pylist()}
    assert got == _oracle_postings(tb)

    # update d005 to brand-new tokens (old bands retract), delete d007,
    # insert a doc with NULL tokens (no postings)
    e2 = _events([("U", 2, 0, "d005", _tokens(777)),
                  ("D", 2, 1, "d007", None),
                  ("I", 2, 2, "d-null", None)])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    m2 = refresh(view, vd, tb)
    assert m2 is not None and m2.epoch_counters["mode"] == "incremental"
    got2 = {(r["bucket"], r["doc_id"]) for r in view_to_arrow(vd).to_pylist()}
    assert got2 == _oracle_postings(tb)
    assert not any(d == "d007" for _, d in got2)
    assert not any(d == "d-null" for _, d in got2)


def test_neardup_search_confirms_exact_jaccard_and_tracks_updates(tmp_path):
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "view")
    base = _tokens(42, n=120)
    rows = [("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(25)]
    rows += [("I", 1, 25, "dup-a", base),
             ("I", 1, 26, "dup-b", _near(base, flips=3, seed=9))]
    e1 = _events(rows)
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    view = neardup_index_view(k=K)
    refresh(view, vd, tb, num_partitions=4)

    res = neardup_search(vd, tb, ["dup-a"], threshold=0.5, k=K).to_pylist()
    assert [r["doc_id"] for r in res] == ["dup-b"]
    expect_j = token_shingle_jaccard(base, _near(base, flips=3, seed=9), k=K)
    assert res[0]["jaccard"] == pytest.approx(expect_j, abs=1e-5)
    assert res[0]["truncated"] is False
    # unrelated random docs have no near-dups at this threshold
    assert neardup_search(vd, tb, ["d003"], threshold=0.5, k=K).num_rows == 0

    # rewrite dup-b far away: the pair must vanish after refresh
    e2 = _events([("U", 2, 0, "dup-b", _tokens(888, n=120))])
    apply_events_dataset(ray.data.from_arrow(e2), tb, 2, e2.schema, num_partitions=4)
    with pytest.raises(ValueError, match="stale"):
        neardup_search(vd, tb, ["dup-a"], k=K)
    refresh(view, vd, tb)
    assert neardup_search(vd, tb, ["dup-a"], threshold=0.5, k=K).num_rows == 0

    # wrong shingle width → signature mismatch, not silent recall loss
    with pytest.raises(ValueError, match="signature mismatch"):
        neardup_search(vd, tb, ["dup-a"], k=K + 2)
    # wrong tokens column too: part of the baked identity (ADVICE r3)
    with pytest.raises(ValueError, match="signature mismatch"):
        neardup_search(vd, tb, ["dup-a"], k=K, tokens_column="other_tokens")


def test_neardup_subscription_syncs_with_replay(tmp_path):
    """A 'neardup' subscription follows the table's commits like the
    other derived-state kinds."""
    from gamechanger_data_ray.engine.subscriptions import subscribe, sync

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([("I", 1, i, f"d{i:03d}", _tokens(i)) for i in range(12)])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema, num_partitions=4)
    subscribe(tb, "neardup", vd, params={"k": K})
    rows = sync(tb)
    assert rows and rows[0].get("epoch") == 1
    got = {(r["bucket"], r["doc_id"]) for r in view_to_arrow(vd).to_pylist()}
    assert got == _oracle_postings(tb)


def test_neardup_cli_verbs(tmp_path):
    """neardup-view / neardup-search CLI end-to-end from a bootstrap
    snapshot (in-process main(); Ray is the session fixture's)."""
    import json

    import pyarrow.parquet as pq

    from gamechanger_data_ray.__main__ import main

    base = _tokens(4, n=100)
    snap = str(tmp_path / "snap.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [f"d{i:02d}" for i in range(10)] + ["dup-a", "dup-b"],
            "tokens": pa.array(
                [_tokens(i) for i in range(10)]
                + [base, _near(base, flips=2, seed=5)],
                pa.list_(pa.int32())),
        }),
        snap,
    )
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    assert main(["bootstrap", "--from", snap, "--table", tb]) == 0
    assert main(["neardup-view", "--table", tb, "--view", vd]) == 0
    assert main(["neardup-search", "--table", tb, "--view", vd,
                 "--doc-id", "dup-a", "--threshold", "0.5"]) == 0


def test_neardup_cli_key_column_flag(tmp_path):
    """ADVICE r3: neardup-search exposes --key-column and threads it into
    the signature check — a matching value searches fine, a mismatched
    one refuses loudly instead of silently returning wrong results."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from gamechanger_data_ray.__main__ import main

    base = _tokens(4, n=100)
    snap = str(tmp_path / "snap.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [f"i{k:02d}" for k in range(8)] + ["dup-a", "dup-b"],
            "tokens": pa.array(
                [_tokens(k) for k in range(8)]
                + [base, _near(base, flips=2, seed=5)],
                pa.list_(pa.int32())),
        }),
        snap,
    )
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    assert main(["bootstrap", "--from", snap, "--table", tb]) == 0
    assert main(["neardup-view", "--table", tb, "--view", vd]) == 0
    assert main(["neardup-search", "--table", tb, "--view", vd,
                 "--key-column", "doc_id", "--doc-id", "dup-a"]) == 0
    with _pytest.raises(ValueError, match="signature mismatch"):
        main(["neardup-search", "--table", tb, "--view", vd,
              "--key-column", "item_id", "--doc-id", "dup-a"])
