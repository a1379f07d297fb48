"""Debezium-envelope source: JSONL envelope replay must produce the exact
same committed table as native epoch replay over the same logical events
(per-row token-array equality), with the same exactly-once contract."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from gamechanger_data_ray.core.changelog import generate_epoch_table, write_changelog
from gamechanger_data_ray.engine.cdc import replay, table_to_arrow
from gamechanger_data_ray.sources.cdc_envelope import (
    apply_envelopes,
    infer_payload_fields,
    parse_envelope_table,
    read_envelopes,
)

PAYLOAD = ["version_hash", "tokens", "n_tok", "source"]
OP_TO_ENVELOPE = {"I": "c", "U": "u", "D": "d"}


def _to_envelopes(t: pa.Table) -> list[dict]:
    rows = t.to_pylist()
    out = []
    for r in rows:
        op = OP_TO_ENVELOPE[r["op"]]
        image = {"doc_id": r["doc_id"], **{k: r[k] for k in PAYLOAD}}
        env = {
            "op": op,
            "before": {"doc_id": r["doc_id"]} if op == "d" else None,
            "after": None if op == "d" else image,
            "source": {"lsn": r["lsn"]},
            "seq": r["seq"],
            "ts_ms": 1700000000000 + r["lsn"],
        }
        out.append(env)
    return out


def _write_jsonl(path: str, envelopes: list[dict]) -> None:
    with open(path, "w") as f:
        for e in envelopes:
            f.write(json.dumps(e) + "\n")


@pytest.fixture()
def epoch_events():
    # epoch 2 so the mix has U/D against epoch-1 keys; snapshot 'r' ops too
    return generate_epoch_table(2, events_per_epoch=300, num_keys=60, seed=7)


def test_envelope_replay_matches_native(tmp_path, epoch_events):
    cd = str(tmp_path / "cl")
    native_td, env_td = str(tmp_path / "native"), str(tmp_path / "env")
    # native path: one epoch changelog → replay
    write_changelog(cd, num_epochs=1, events_per_epoch=300, num_keys=60, seed=7)
    # regenerate the SAME events the changelog holds (epoch 1 this time)
    ev = generate_epoch_table(1, events_per_epoch=300, num_keys=60, seed=7)
    replay(cd, native_td, num_partitions=4)

    jl = str(tmp_path / "ev.jsonl")
    _write_jsonl(jl, _to_envelopes(ev))
    m = apply_envelopes(
        [jl], env_td, epoch=1, num_partitions=4,
        payload_schema=pa.schema(
            [("version_hash", pa.string()), ("tokens", pa.list_(pa.int32())),
             ("n_tok", pa.int32()), ("source", pa.string())]
        ),
    )
    assert m is not None

    a = table_to_arrow(native_td).select(["doc_id", "tokens", "n_tok", "source"])
    b = table_to_arrow(env_td).select(["doc_id", "tokens", "n_tok", "source"])
    assert a.equals(b), "envelope replay diverged from native replay"


def test_envelope_payload_inference_and_int64_tokens(tmp_path, epoch_events):
    """Without payload_schema, JSON-inferred types (tokens list<int64>)
    still commit and round-trip values correctly."""
    td = str(tmp_path / "tb")
    jl = str(tmp_path / "ev.jsonl")
    _write_jsonl(jl, _to_envelopes(epoch_events))
    assert set(infer_payload_fields(jl)) == set(PAYLOAD)
    m = apply_envelopes([jl], td, epoch=1, num_partitions=2)
    assert m is not None and m.totals["rows"] > 0
    t = table_to_arrow(td)
    assert pa.types.is_list(t.schema.field("tokens").type)


def test_envelope_replay_is_exactly_once(tmp_path, epoch_events):
    td = str(tmp_path / "tb")
    jl = str(tmp_path / "ev.jsonl")
    _write_jsonl(jl, _to_envelopes(epoch_events))
    m1 = apply_envelopes([jl], td, epoch=1, num_partitions=2)
    before = table_to_arrow(td)
    assert apply_envelopes([jl], td, epoch=1, num_partitions=2) is None  # fenced
    assert table_to_arrow(td).equals(before)
    assert m1 is not None


def test_envelope_delete_tombstones(tmp_path):
    td = str(tmp_path / "tb")
    envs = [
        {"op": "c", "before": None,
         "after": {"doc_id": "d1", "version_hash": "v1", "tokens": [1, 2], "n_tok": 2, "source": "s"},
         "source": {"lsn": 1}, "seq": 0},
        {"op": "c", "before": None,
         "after": {"doc_id": "d2", "version_hash": "v2", "tokens": [3], "n_tok": 1, "source": "s"},
         "source": {"lsn": 1}, "seq": 1},
        {"op": "d", "before": {"doc_id": "d1"}, "after": None,
         "source": {"lsn": 2}, "seq": 0},
    ]
    jl = str(tmp_path / "ev.jsonl")
    _write_jsonl(jl, envs)
    apply_envelopes([jl], td, epoch=1, num_partitions=2)
    t = table_to_arrow(td)
    alive = t.filter(pa.compute.field("op") != "D") if "op" in t.column_names else t
    assert alive["doc_id"].to_pylist() == ["d2"]


def test_envelope_unknown_op_raises():
    t = pa.table({"op": ["x"], "ts_ms": [1],
                  "after": pa.array([{"doc_id": "d"}])})
    with pytest.raises(ValueError, match="unknown envelope op"):
        parse_envelope_table(t, [])


def test_envelope_snapshot_read_op_is_insert(tmp_path):
    envs = [
        {"op": "r", "before": None,
         "after": {"doc_id": "d9", "version_hash": "v", "tokens": [7], "n_tok": 1, "source": "s"},
         "source": {"lsn": 5}, "seq": 0},
    ]
    jl = str(tmp_path / "ev.jsonl")
    _write_jsonl(jl, envs)
    ds = read_envelopes([jl])
    t = ds.take_all()
    assert t[0]["op"] == "I" and t[0]["doc_id"] == "d9" and t[0]["lsn"] == 5


def test_publish_envelopes_closure(tmp_path):
    """Outbound CDC loop: publish the e1→e3 diff as envelopes, apply them
    onto a copy of the e1 state → byte-identical payload to the e3 state."""
    import glob
    import shutil

    from gamechanger_data_ray.sources.cdc_envelope import publish_envelopes

    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=3, events_per_epoch=200, num_keys=50, seed=11)
    replay(cd, td, num_partitions=4, epochs_per_commit=1)

    feed = str(tmp_path / "feed")
    publish_envelopes(td, feed, from_epoch=1, to_epoch=3)
    files = sorted(glob.glob(os.path.join(feed, "*.json")))
    assert files, "publish_envelopes wrote no shards"

    # reconstruct: copy of the table rolled back to epoch 1, then apply feed
    td2 = str(tmp_path / "tb2")
    shutil.copytree(td, td2)
    from gamechanger_data_ray.engine.maintenance import restore

    restore(td2, 1)
    m = apply_envelopes(
        files, td2, epoch=3,
        payload_schema=pa.schema(
            [("version_hash", pa.string()), ("tokens", pa.list_(pa.int32())),
             ("n_tok", pa.int32()), ("source", pa.string())]
        ),
    )
    assert m is not None
    cols = ["doc_id", "tokens", "n_tok", "source"]
    a = table_to_arrow(td).select(cols)
    b = table_to_arrow(td2).select(cols)
    assert a.equals(b), "published feed did not reconverge the e1 state to e3"


def test_partial_envelopes_coalesce(tmp_path):
    """Debezium patch semantics end-to-end: an 'after' image carrying only
    the changed field leaves other columns untouched under
    update_mode='coalesce' (and would null them under replace)."""
    td = str(tmp_path / "tb")
    f1, f2 = str(tmp_path / "e1.jsonl"), str(tmp_path / "e2.jsonl")
    _write_jsonl(f1, [{
        "op": "c", "before": None,
        "after": {"doc_id": "a", "version_hash": "h1", "tokens": [1, 2],
                  "n_tok": 2, "source": "web"},
        "source": {"lsn": 1}, "seq": 0, "ts_ms": 1,
    }])
    # partial update: only source changes; tokens/n_tok/version_hash omitted
    _write_jsonl(f2, [{
        "op": "u", "before": None,
        "after": {"doc_id": "a", "source": "pdf"},
        "source": {"lsn": 2}, "seq": 0, "ts_ms": 2,
    }])
    schema = pa.schema([("version_hash", pa.string()),
                        ("tokens", pa.list_(pa.int32())),
                        ("n_tok", pa.int32()), ("source", pa.string())])
    apply_envelopes([f1], td, epoch=1, payload_fields=PAYLOAD,
                    payload_schema=schema, num_partitions=2,
                    update_mode="coalesce")
    apply_envelopes([f2], td, epoch=2, payload_fields=PAYLOAD,
                    payload_schema=schema, num_partitions=2,
                    update_mode="coalesce")
    row = table_to_arrow(td).to_pylist()[0]
    assert row["source"] == "pdf"
    assert row["tokens"] == [1, 2] and row["n_tok"] == 2
    assert row["version_hash"] == "h1"
