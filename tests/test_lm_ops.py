"""LM-based corpus curation ops: the exact-integer surprisal kernel and
serial (non-SQL) oracles for the CCNet-shape perplexity filter and the
DSIR-shape importance resampler. The DuckDB hash-exact oracles run via
tests/test_queries.py (module ORACLES); these tests pin the kernel
contract and the semantics independently of SQL.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from gamechanger_data_ray.pipelines import tokens as T

SF = "/root/testdata/sf0.001"


def test_surprisal_bits_matches_exact_floor_log2():
    """floor(log2(den/num)) — kernel vs python bigint ground truth over
    random pairs plus the boundary shapes (equal, exact powers of two,
    one-off-a-power)."""
    rng = np.random.default_rng(7)
    num = rng.integers(1, 1 << 30, 5000)
    den = num + rng.integers(0, 1 << 31, 5000)
    edges = np.array(
        [[1, 1], [2, 1], [3, 1], [4, 1], [7, 1], [8, 1], [9, 1],
         [1024, 1], [1023, 1], [1025, 1], [6, 3], [7, 3], [5, 5],
         [(1 << 40) - 1, 1], [1 << 40, 1]],
        dtype=np.int64,
    )
    den = np.concatenate([den, edges[:, 0]])
    num = np.concatenate([num, edges[:, 1]])
    got = T._surprisal_bits(den, num)

    def exact(d, n):
        k = 0
        while n << (k + 1) <= d:
            k += 1
        return k

    want = np.array([exact(int(d), int(n)) for d, n in zip(den, num)])
    assert (got == want).all()
    # and the float intuition holds where floats are trustworthy
    mask = den < 1 << 20
    fl = np.floor(np.log2(den[mask] / num[mask])).astype(int)
    assert (np.abs(got[mask] - fl) <= 1).all()


def _words(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), [s.split(" ") for s in t["text"].to_pylist()]))


def test_lm_perplexity_matches_serial_recount(sf_dir):
    """Distributed bits == a one-process Counter fold with the same
    add-one-smoothed integer surprisal, and the rational threshold
    actually bisects the corpus (both kept and dropped docs exist)."""
    docs = _words(SF)
    ug = Counter(w for _, ws in docs for w in ws)
    bg = Counter((a, b) for _, ws in docs for a, b in zip(ws, ws[1:]))
    v = len(ug)

    def bits(d, n):
        return int(math.floor(math.log2(d / n))) if d < (1 << 40) else 0

    expect = {}
    for did, ws in docs:
        tot = sum(
            T._surprisal_bits(
                np.array([ug[a] + v], dtype=np.int64),
                np.array([bg[(a, b)] + 1], dtype=np.int64),
            )[0]
            for a, b in zip(ws, ws[1:])
        )
        expect[did] = (int(tot), len(ws) - 1)

    out = T.docs_lm_perplexity(SF).to_pandas()
    assert len(out) == len(docs)
    for _, r in out.iterrows():
        tb, nt = expect[int(r.doc_id)]
        assert (int(r.total_bits), int(r.n_trans)) == (tb, nt)
        assert bool(r.keep) == (T._PPL_TAU_DEN * tb <= T._PPL_TAU_NUM * nt)
    kept = out["keep"].mean()
    assert 0.0 < kept < 1.0, f"threshold does not split the corpus: {kept}"


def test_dsir_sample_matches_serial_recount(sf_dir):
    """Top-k == a one-process recompute of the integer importance
    weights (raw-vs-target surprisal difference), ties on doc_id."""
    docs = _words(SF)
    raw = Counter(w for _, ws in docs for w in ws)
    tgt = Counter(w for did, ws in docs if did % 97 == 0 for w in ws)
    v = len(raw)
    n_raw = sum(raw.values())
    n_tgt = sum(tgt.values())

    def sb(d, n):
        return int(T._surprisal_bits(np.array([d], np.int64), np.array([n], np.int64))[0])

    weight = {w: sb(n_raw + v, c + 1) - sb(n_tgt + v, tgt.get(w, 0) + 1)
              for w, c in raw.items()}
    scores = [(did, sum(weight[w] for w in ws)) for did, ws in docs]
    scores.sort(key=lambda t: (-t[1], t[0]))
    want = scores[: T._DSIR_K]

    got = T.docs_dsir_sample(SF)
    assert list(zip(got["doc_id"], got["score"])) == want
