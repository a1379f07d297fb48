"""Epoch-to-epoch drift report: PSI against a hand-computed oracle,
identical-distribution ≈ 0, injected source-mix shift detected,
high-cardinality columns degrade to a flag, histogram totals exact."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import apply_events_dataset
from gamechanger_data_ray.engine.drift import MAX_BUCKETS, drift_report, psi

P = 4


def _events(docs, ntoks, sources, epoch):
    n = len(docs)
    return pa.table({
        "op": pa.array(["I"] * n, pa.string()),
        "lsn": pa.array(np.full(n, epoch, dtype=np.int64)),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "doc_id": pa.array(docs, pa.string()),
        "tokens": pa.array([[1]] * n, pa.list_(pa.int32())),
        "n_tok": pa.array(ntoks, pa.int32()),
        "source": pa.array(sources, pa.string()),
    })


def _apply(tb, epoch, t):
    apply_events_dataset(ray.data.from_arrow(t), tb, epoch, t.schema,
                         num_partitions=P)


def test_psi_oracle():
    # hand-computed: p = [.5,.5], q = [.9,.1]
    expect = (0.5 - 0.9) * math.log(0.5 / 0.9) + (0.5 - 0.1) * math.log(0.5 / 0.1)
    assert psi({"a": 50, "b": 50}, {"a": 90, "b": 10}) == pytest.approx(expect, abs=1e-6)
    assert psi({}, {}) == 0.0
    # one-sided bucket contributes finitely (smoothed)
    assert psi({"a": 10}, {"b": 10}) > 0


def test_drift_detects_source_shift(tmp_path):
    tb = str(tmp_path / "t")
    # epoch 1: 60 docs, sources evenly split, n_tok ~ 2^5
    docs1 = [f"d{i:04d}" for i in range(60)]
    _apply(tb, 1, _events(docs1, [32 + i % 16 for i in range(60)],
                          ["web" if i % 2 else "pdf" for i in range(60)], 1))
    # epoch 2: 40 NEW docs, all "crawlX" source, tiny n_tok (a bad crawl)
    docs2 = [f"x{i:04d}" for i in range(40)]
    _apply(tb, 2, _events(docs2, [2] * 40, ["crawlX"] * 40, 2))
    rep = drift_report(tb, 1, 2)
    assert rep["rows"] == {"from": 60, "to": 100, "delta": 40}
    src = rep["columns"]["source"]
    assert src["added_buckets"] == ["crawlX"]
    assert src["psi"] > 0.25  # "shifted" by the standard rule of thumb
    assert src["from"] == {"pdf": 30, "web": 30}
    assert src["to"] == {"crawlX": 40, "pdf": 30, "web": 30}
    nt = rep["columns"]["n_tok"]
    assert nt["from"] == {"2^5": 60}
    assert nt["to"] == {"2^1": 40, "2^5": 60}
    assert nt["psi"] > 0.25
    # same epoch against itself: no drift
    same = drift_report(tb, 2, 2)
    assert all(c["psi"] == 0.0 for c in same["columns"].values()
               if "psi" in c)


def test_schema_evolution_column_reported_absent(tmp_path):
    """A column added mid-stream doesn't exist in older epochs' schemas;
    drift reports the asymmetry instead of crashing the run."""
    tb = str(tmp_path / "t")
    _apply(tb, 1, _events([f"d{i}" for i in range(10)], [8] * 10, ["s"] * 10, 1))
    t2 = _events([f"e{i}" for i in range(10)], [8] * 10, ["s"] * 10, 2)
    t2 = t2.append_column("lang", pa.array(["en"] * 10))
    _apply(tb, 2, t2)
    rep = drift_report(tb, 1, 2)
    assert rep["columns"]["lang"] == {"absent_at": "from"}
    assert rep["columns"]["n_tok"]["psi"] == 0.0  # unchanged distribution


def test_high_cardinality_flag_and_column_selection(tmp_path):
    tb = str(tmp_path / "t")
    n = MAX_BUCKETS + 50
    docs = [f"d{i:05d}" for i in range(n)]
    t = _events(docs, [8] * n, ["s"] * n, 1)
    # version_hash-like unique string payload column
    t = t.append_column("tag", pa.array([f"tag-{i:05d}" for i in range(n)]))
    _apply(tb, 1, t)
    rep = drift_report(tb, 1, 1)
    tag = rep["columns"]["tag"]
    assert tag["high_cardinality"] is True
    # exact distinct when no block short-circuited, None otherwise
    assert tag["distinct_from"] in (n, None)
    assert tag["distinct_to"] == tag["distinct_from"]
    only = drift_report(tb, 1, 1, columns=["n_tok"])
    assert list(only["columns"]) == ["n_tok"]
    with pytest.raises(ValueError):
        drift_report(tb, 1, 1, columns=["tokens"])  # list payload: not scalar
