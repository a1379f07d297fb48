"""Ingest-time quality gate (engine/ingest_gate.py mode='quality'):
the Gopher/C4-style rules applied to the token payload at ingest —
stateless, no index, screens even the very first epoch."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import table_to_arrow
from gamechanger_data_ray.engine.ingest_gate import (
    JACCARD_COLUMN,
    MATCH_COLUMN,
    apply_with_neardup_gate,
    read_quarantine,
)


def _tokens(seed: int, n: int = 120) -> list[int]:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 30000, size=n).astype(int).tolist()


def _events(rows):
    op, lsn, seq, doc, toks = zip(*rows)
    return pa.table({
        "op": pa.array(op, pa.string()),
        "lsn": pa.array(lsn, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "doc_id": pa.array(doc, pa.string()),
        "tokens": pa.array(
            [list(t) if t is not None else None for t in toks],
            pa.list_(pa.int32())),
    })


def test_quality_gate_suppresses_degenerate_on_fresh_table(tmp_path):
    """Quality mode screens epoch 1 of a FRESH table (index modes pass
    through until an index exists): repetition collapse and too-short
    payloads quarantine with a reason; healthy docs, null payloads and
    deletes pass."""
    tb = str(tmp_path / "tb")
    e1 = _events([
        ("I", 1, 0, "healthy", _tokens(1)),
        ("I", 1, 1, "repeat", [7] * 50),          # top_frac 1.0 → out
        ("I", 1, 2, "short", [1, 2, 3]),          # n_tok 3 < 5 → out
        ("I", 1, 3, "healthy-2", _tokens(2)),
        ("I", 1, 4, "null-payload", None),        # passes (nothing to score)
        ("D", 1, 5, "ghost", None),               # deletes pass
    ])
    res = apply_with_neardup_gate(
        ray.data.from_arrow(e1), tb, None, 1, e1.schema,
        num_partitions=2, mode="quality")
    assert res["suppressed"] == 2
    ids = set(table_to_arrow(tb)["doc_id"].to_pylist())
    assert {"healthy", "healthy-2", "null-payload"} <= ids
    assert not {"repeat", "short"} & ids
    q = read_quarantine(tb, 1)
    reasons = {r["doc_id"]: r[MATCH_COLUMN] for r in q.to_pylist()}
    assert reasons["repeat"].startswith("quality:top_token_frac=1.000")
    assert reasons["short"] == "quality:n_tok=3<5"
    assert all(r[JACCARD_COLUMN] is None for r in q.to_pylist())
    # a quality rejection has no committed twin: the payload must ride
    # into quarantine (dup modes drop it — the twin holds the content)
    assert "tokens" in q.schema.names
    assert {r["doc_id"]: r["tokens"] for r in q.to_pylist()}["repeat"] == [7] * 50


def test_quality_gate_max_tok_bound(tmp_path):
    tb = str(tmp_path / "tb")
    e1 = _events([
        ("I", 1, 0, "ok", _tokens(3, n=100)),
        ("I", 1, 1, "runaway", _tokens(4, n=5000)),
    ])
    res = apply_with_neardup_gate(
        ray.data.from_arrow(e1), tb, None, 1, e1.schema,
        num_partitions=2, mode="quality", max_tok=1000)
    assert res["suppressed"] == 1
    q = read_quarantine(tb, 1).to_pylist()
    assert q[0]["doc_id"] == "runaway"
    assert q[0][MATCH_COLUMN] == "quality:n_tok=5000>1000"


def test_chained_gate_quality_then_exact(tmp_path):
    """mode=['quality','exact']: the full ingest stack in ONE epoch pass.
    First flag wins — a row that is BOTH degenerate and an exact dup
    carries the quality reason; clean rows flow through both screens."""
    from gamechanger_data_ray.engine.dedup_index import content_index_view
    from gamechanger_data_ray.engine.views import refresh

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    base = _tokens(3)
    e1 = _events([
        ("I", 1, 0, "d-base", list(base)),
        ("I", 1, 1, "d-rep", [9] * 40),  # committed despite repetition
        ("I", 1, 2, "d-other", _tokens(4)),
    ])
    apply_with_neardup_gate(ray.data.from_arrow(e1), tb, vd, 1, e1.schema,
                            num_partitions=2, mode="exact")
    e2 = _events([
        ("I", 2, 0, "dup", list(base)),          # exact dup → exact reason
        ("I", 2, 1, "degen-dup", [9] * 40),      # degenerate AND dup → quality
        ("I", 2, 2, "short", [1, 2]),            # quality
        ("I", 2, 3, "novel", _tokens(5)),        # passes both
    ])
    res = apply_with_neardup_gate(
        ray.data.from_arrow(e2), tb, vd, 2, e2.schema,
        num_partitions=2, mode=["quality", "exact"])
    assert res["suppressed"] == 3
    ids = set(table_to_arrow(tb)["doc_id"].to_pylist())
    assert "novel" in ids and not {"dup", "degen-dup", "short"} & ids
    q = {r["doc_id"]: r for r in read_quarantine(tb, 2).to_pylist()}
    assert q["dup"][MATCH_COLUMN] == "d-base"
    assert q["dup"][JACCARD_COLUMN] == 1.0
    assert q["degen-dup"][MATCH_COLUMN].startswith("quality:top_token_frac")
    assert q["short"][MATCH_COLUMN].startswith("quality:n_tok")
    # quality in the chain → payloads ride into quarantine
    assert q["short"]["tokens"] == [1, 2]
    # the exact index is refreshed to epoch 2 (the chain maintains it)
    assert refresh(content_index_view(), vd, tb) is None  # already current


def test_chained_gate_quality_then_neardup(tmp_path):
    """mode=['quality','neardup']: near-miss content flags with the
    neardup match + true jaccard; degenerate rows carry the quality
    reason; every suppressed row keeps its payload (neither screen in
    this chain is byte-recoverable)."""
    from gamechanger_data_ray.engine.cdc import apply_events_dataset
    from gamechanger_data_ray.engine.neardup_index import neardup_index_view
    from gamechanger_data_ray.engine.views import refresh as vrefresh

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    base = _tokens(6)
    e1 = _events([("I", 1, 0, "orig", list(base)),
                  ("I", 1, 1, "other", _tokens(7))])
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=2)
    vrefresh(neardup_index_view(k=5), vd, tb, num_partitions=2)

    near = list(base)
    near[0] += 1000
    e2 = _events([
        ("I", 2, 0, "close-call", near),        # near-dup of orig
        ("I", 2, 1, "degen", [4] * 30),         # quality (first flag wins)
        ("I", 2, 2, "novel", _tokens(8)),       # passes both
    ])
    res = apply_with_neardup_gate(
        ray.data.from_arrow(e2), tb, vd, 2, e2.schema,
        num_partitions=2, mode=["quality", "neardup"])
    assert res["suppressed"] == 2
    ids = set(table_to_arrow(tb)["doc_id"].to_pylist())
    assert "novel" in ids and not {"close-call", "degen"} & ids
    q = {r["doc_id"]: r for r in read_quarantine(tb, 2).to_pylist()}
    assert q["close-call"][MATCH_COLUMN] == "orig"
    assert 0.5 <= q["close-call"][JACCARD_COLUMN] < 1.0
    assert q["degen"][MATCH_COLUMN].startswith("quality:")
    assert q["close-call"]["tokens"] == near  # payload retained
    assert q["degen"]["tokens"] == [4] * 30


def test_chained_gate_rejects_two_index_screens(tmp_path):
    from gamechanger_data_ray.engine.ingest_gate import screen_events

    e1 = _events([("I", 1, 0, "d0", _tokens(1))])
    with pytest.raises(ValueError, match="at most one index screen"):
        screen_events(ray.data.from_arrow(e1), str(tmp_path / "tb"),
                      str(tmp_path / "v"), mode=["exact", "neardup"])
    with pytest.raises(ValueError, match="at least one gate mode"):
        screen_events(ray.data.from_arrow(e1), str(tmp_path / "tb"),
                      None, mode=[])


def test_readmit_quality_rejection_payload_direct(tmp_path):
    """A quality false positive readmits from its quarantined payload as
    a new epoch; the gate index (passed via view_dir/mode) refreshes so
    the next gated epoch is not stale."""
    from gamechanger_data_ray.engine.ingest_gate import readmit

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([
        ("I", 1, 0, "keep", _tokens(1)),
        ("I", 1, 1, "flagged", [5] * 30),  # legit glossary doc, say
    ])
    apply_with_neardup_gate(ray.data.from_arrow(e1), tb, vd, 1, e1.schema,
                            num_partitions=2, mode=["quality", "exact"])
    assert "flagged" not in set(table_to_arrow(tb)["doc_id"].to_pylist())

    r = readmit(tb, 1, ["flagged"], num_partitions=2,
                view_dir=vd, mode=["quality", "exact"])
    assert r == {"epoch": 2, "readmitted": 1}
    t = table_to_arrow(tb)
    rows = {d: tok for d, tok in zip(t["doc_id"].to_pylist(),
                                     t["tokens"].to_pylist())}
    assert rows["flagged"] == [5] * 30
    # index refreshed: the next gated epoch screens (no staleness error),
    # and a dup of the readmitted doc is now caught
    e3 = _events([("I", 3, 0, "copycat", [5] * 30)])
    res3 = apply_with_neardup_gate(
        ray.data.from_arrow(e3), tb, vd, 3, e3.schema,
        num_partitions=2, mode="exact")
    assert res3["suppressed"] == 1


def test_readmit_exact_dup_reconstructs_from_twin(tmp_path):
    """Exact-dup rejections quarantine WITHOUT a payload; readmit
    reconstructs the identical content from the committed twin."""
    from gamechanger_data_ray.engine.dedup_index import content_index_view
    from gamechanger_data_ray.engine.ingest_gate import readmit
    from gamechanger_data_ray.engine.views import refresh as vrefresh

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    base = _tokens(7)
    e1 = _events([("I", 1, 0, "orig", list(base))])
    apply_with_neardup_gate(ray.data.from_arrow(e1), tb, vd, 1, e1.schema,
                            num_partitions=2, mode="exact")
    e2 = _events([("I", 2, 0, "mirror", list(base))])
    res = apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2,
                                  e2.schema, num_partitions=2, mode="exact")
    assert res["suppressed"] == 1
    q = read_quarantine(tb, 2)
    assert "tokens" not in q.schema.names  # dup quarantine has no payload

    r = readmit(tb, 2, view_dir=vd, mode="exact", num_partitions=2)
    assert r == {"epoch": 3, "readmitted": 1}
    t = table_to_arrow(tb)
    rows = {d: tok for d, tok in zip(t["doc_id"].to_pylist(),
                                     t["tokens"].to_pylist())}
    assert rows["mirror"] == list(base) == rows["orig"]
    vrefresh(content_index_view(), vd, tb)  # no-op if readmit refreshed
    # unknown id refuses with the id named
    with pytest.raises(ValueError, match="not in epoch 2"):
        readmit(tb, 2, ["nope"], num_partitions=2)


def test_readmit_neardup_rejection_from_retained_payload(tmp_path):
    """Near-dup rejections (jaccard < 1) quarantine WITH their payload —
    the twin differs, so the content exists nowhere else — and readmit
    brings back the ORIGINAL bytes, not the twin's."""
    from gamechanger_data_ray.engine.ingest_gate import readmit
    from gamechanger_data_ray.engine.neardup_index import neardup_index_view
    from gamechanger_data_ray.engine.views import refresh as vrefresh

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    base = _tokens(9)
    e1 = _events([("I", 1, 0, "orig", list(base))])
    from gamechanger_data_ray.engine.cdc import apply_events_dataset
    apply_events_dataset(ray.data.from_arrow(e1), tb, 1, e1.schema,
                         num_partitions=2)
    vrefresh(neardup_index_view(k=5), vd, tb, num_partitions=2)
    near = list(base)
    near[0] += 1000
    e2 = _events([("I", 2, 0, "close-call", near)])
    res = apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2,
                                  e2.schema, num_partitions=2, mode="neardup")
    assert res["suppressed"] == 1
    r = readmit(tb, 2, num_partitions=2,
                view_dir=vd, mode="neardup")
    assert r["readmitted"] == 1
    t = table_to_arrow(tb)
    rows = {d: tok for d, tok in zip(t["doc_id"].to_pylist(),
                                     t["tokens"].to_pylist())}
    assert rows["close-call"] == near  # the original, NOT the twin


def test_readmit_refuses_when_exact_twin_deleted(tmp_path):
    """A pure-exact quarantine holds no payload; if the committed twin
    is deleted before readmit, the bytes are gone — refuse loudly."""
    from gamechanger_data_ray.engine.cdc import apply_events_dataset
    from gamechanger_data_ray.engine.ingest_gate import readmit

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    base = _tokens(11)
    e1 = _events([("I", 1, 0, "orig", list(base))])
    apply_with_neardup_gate(ray.data.from_arrow(e1), tb, vd, 1, e1.schema,
                            num_partitions=2, mode="exact")
    e2 = _events([("I", 2, 0, "mirror", list(base))])
    apply_with_neardup_gate(ray.data.from_arrow(e2), tb, vd, 2, e2.schema,
                            num_partitions=2, mode="exact")
    e3 = _events([("D", 3, 0, "orig", None)])
    apply_events_dataset(ray.data.from_arrow(e3), tb, 3, e3.schema,
                         num_partitions=2)
    with pytest.raises(ValueError, match="no longer committed"):
        readmit(tb, 2, num_partitions=2)


def test_readmit_cli(tmp_path):
    from gamechanger_data_ray.__main__ import main
    from gamechanger_data_ray.state import manifest as mf

    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    e1 = _events([("I", 1, 0, "keep", _tokens(1)),
                  ("I", 1, 1, "fp", [3] * 20)])
    apply_with_neardup_gate(ray.data.from_arrow(e1), tb, vd, 1, e1.schema,
                            num_partitions=2, mode=["quality", "exact"])
    assert main(["readmit", "--table", tb, "--from-epoch", "1",
                 "--doc-id", "fp", "--view", vd,
                 "--gate-mode", "quality,exact", "--partitions", "2"]) == 0
    assert mf.load_current(tb).epoch == 2
    assert "fp" in set(table_to_arrow(tb)["doc_id"].to_pylist())


def test_quality_gate_cli_replay(tmp_path):
    """replay-gated --mode quality over a generated changelog: no --view
    needed; every ready epoch commits with the sub-threshold payloads
    quarantined."""
    from gamechanger_data_ray.__main__ import main
    from gamechanger_data_ray.state import manifest as mf

    cl, tb = str(tmp_path / "cl"), str(tmp_path / "tb")
    assert main(["generate", "--out", cl, "--epochs", "2", "--events", "600",
                 "--keys", "80", "--zipf", "1.2"]) == 0
    # generator payloads average ~96 tokens: min-tok 80 suppresses a
    # nontrivial slice while most events land
    assert main(["replay-gated", "--changelog", cl, "--table", tb,
                 "--mode", "quality", "--min-tok", "80",
                 "--partitions", "4"]) == 0
    cur = mf.load_current(tb)
    assert cur is not None and cur.epoch == 2
    assert table_to_arrow(tb).num_rows > 0
    # the changelog's hive layout (epoch=NNNN/) must not leak a phantom
    # partition column into the quarantine (a readmit would then commit
    # it into the table schema)
    q = read_quarantine(tb, 1)
    assert q.num_rows == 0 or "epoch" not in q.schema.names
    q2 = read_quarantine(tb, 2)
    assert q2.num_rows > 0 and "epoch" not in q2.schema.names
