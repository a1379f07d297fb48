"""Token-array MinHash dedup — verified against exact token-shingle Jaccard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from gamechanger_data_ray.stages import dedup as dd


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    docs = {}
    for i in range(40):
        docs[f"d{i}"] = rng.integers(0, 1000, size=80, dtype=np.int32).tolist()
    for i in range(8):  # truncated near-copies
        docs[f"near-d{i}"] = docs[f"d{i}"][:70]
    docs["exact"] = list(docs["d0"])
    docs["empty"] = []
    docs["tiny"] = [1, 2]  # shorter than k → zero signature
    return docs


def test_token_minhash_estimates_jaccard(corpus):
    mh = dd.TokenMinHasher()
    lists = pa.array(list(corpus.values()), pa.list_(pa.int32()))
    sigs = mh.signatures_from_lists(lists)
    keys = list(corpus)
    by = dict(zip(keys, sigs))
    for a, b in [("d0", "near-d0"), ("d3", "near-d3"), ("d0", "exact"), ("d0", "d1")]:
        est = dd.estimated_jaccard(by[a], by[b])
        exact = dd.token_shingle_jaccard(corpus[a], corpus[b], k=5)
        assert abs(est - exact) < 0.25, (a, b, est, exact)
    assert dd.estimated_jaccard(by["d0"], by["exact"]) == 1.0
    assert (by["empty"] == 0).all() and (by["tiny"] == 0).all()


def test_token_minhash_batch_boundary_invariance(corpus):
    """Signatures must not depend on how docs are batched together."""
    mh = dd.TokenMinHasher()
    vals = list(corpus.values())
    all_at_once = mh.signatures_from_lists(pa.array(vals, pa.list_(pa.int32())))
    one_by_one = np.vstack(
        [mh.signatures_from_lists(pa.array([v], pa.list_(pa.int32()))) for v in vals]
    )
    assert (all_at_once == one_by_one).all()


def test_token_dedup_query_finds_seeded_pairs(sf_dir):
    from gamechanger_data_ray.pipelines.analysis_queries import dedup_tokens_minhash

    from gamechanger_data_ray.pipelines.analysis_queries import _token_corpus

    seeded = {
        i[len("near-"):] for i in _token_corpus(sf_dir)["doc_id"].to_pylist()
        if i.startswith("near-")
    }
    out = dedup_tokens_minhash(sf_dir)
    pairs = set(zip(out["id_a"], out["id_b"]))
    # truncated copies keep ~85-90% shingle jaccard → near-total recall
    found = {a for a, b in pairs if b == f"near-{a}"}
    assert seeded, "corpus must contain seeded near-copies"
    assert len(found) >= 0.85 * len(seeded), (len(found), len(seeded))
