"""Bloom filter properties: NO false negatives ever (correctness), sane
false-positive rate at design load, and OR-union composition."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gamechanger_data_ray.core.bloom import BloomFilter


@given(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=300, unique=True),
       st.integers(1, 6))
@settings(max_examples=150, deadline=None)
def test_no_false_negatives(vals, k):
    bf = BloomFilter(n_bits=1 << 12, k=k)
    arr = np.array(vals, dtype=np.uint64)
    if len(arr):
        bf.add_many(arr)
        assert bf.contains_many(arr).all()


def test_false_positive_rate_at_design_load():
    rng = np.random.default_rng(3)
    n = 10_000
    bf = BloomFilter(n_bits=1 << 17, k=4)  # ~13 bits/key → ~1% FP design point
    present = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    absent = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    bf.add_many(present)
    fp = bf.contains_many(absent).mean()
    assert fp < 0.05, f"false-positive rate too high: {fp}"


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=100, unique=True))
@settings(max_examples=50, deadline=None)
def test_union_equals_bulk_insert(vals):
    arr = np.array(vals, dtype=np.uint64)
    half = len(arr) // 2
    a, b = BloomFilter(1 << 10, 3), BloomFilter(1 << 10, 3)
    if half:
        a.add_many(arr[:half])
    if len(arr) - half:
        b.add_many(arr[half:])
    u = a.union(b)
    whole = BloomFilter(1 << 10, 3)
    whole.add_many(arr)
    assert (u.bits == whole.bits).all()


def test_hash_antijoin_bloom_joins_only_the_maybe_minority(ray_session):
    """The exact phase is a distributed anti-join over the bloom-maybe
    subset — the minority (true dups + FPs), never the corpus — and no
    exact seen-set is ever collected on the driver (the function has no
    set-accumulation path left; this asserts the phase sizes)."""
    from gamechanger_data_ray.pipelines.incremental import hash_antijoin_bloom

    stats: dict = {}
    out = hash_antijoin_bloom("/root/testdata/sf0.001", _stats=stats).to_pandas()
    assert stats["maybe_rows"] < stats["second_half_rows"]
    # survivors = second-half rows minus true dups; the maybe set must
    # cover the dropped rows exactly (bloom has no false negatives)
    assert stats["second_half_rows"] - len(out) <= stats["maybe_rows"]
