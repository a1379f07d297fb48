"""Token-array MinHash dedup — verified against exact token-shingle Jaccard."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def test_token_span_dedup_matches_naive_oracle(sf_dir):
    """dedup_token_spans must equal a serial dict-based oracle exactly
    (same rolling hash, naive aggregation)."""
    from collections import defaultdict

    from gamechanger_data_ray.pipelines.analysis_queries import (
        _token_corpus,
        dedup_token_spans,
    )
    from gamechanger_data_ray.stages.dedup import token_window_hashes

    W = 16
    out = dedup_token_spans(sf_dir, window=W)

    corpus = _token_corpus(sf_dir).to_pandas()
    docs_by_hash = defaultdict(set)
    occ_by_hash = defaultdict(int)
    for did, toks in zip(corpus["doc_id"], corpus["tokens"]):
        for h in token_window_hashes(np.asarray(toks, dtype=np.int64), W):
            docs_by_hash[int(np.int64(h))].add(did)
            occ_by_hash[int(np.int64(h))] += 1
    expect = (
        pd.DataFrame(
            [
                {"span_hash": h, "n_docs": len(d), "n_occ": occ_by_hash[h],
                 "example_doc": min(d)}
                for h, d in docs_by_hash.items() if len(d) >= 2
            ]
        )
        .sort_values("span_hash")
        .reset_index(drop=True)
    )
    assert len(expect) > 0, "seeded near-copies must produce repeated spans"
    pd.testing.assert_frame_equal(
        out.astype({"span_hash": "int64", "n_docs": "int64", "n_occ": "int64"}),
        expect.astype({"span_hash": "int64", "n_docs": "int64", "n_occ": "int64"}),
    )


def test_token_window_hashes_properties():
    """Position sensitivity, short-doc emptiness, and window count."""
    from gamechanger_data_ray.stages.dedup import token_window_hashes

    t = np.arange(20, dtype=np.int64)
    h = token_window_hashes(t, 16)
    assert len(h) == 5
    # permuted window hashes differently (position-weighted)
    a = token_window_hashes(np.array([1, 2, 3, 4], dtype=np.int64), 4)
    b = token_window_hashes(np.array([4, 3, 2, 1], dtype=np.int64), 4)
    assert a[0] != b[0]
    assert len(token_window_hashes(np.arange(3), 16)) == 0


def test_span_confirm_rejects_crafted_hash_collision():
    """Two docs with DIFFERENT 2-token windows engineered to share the
    same 64-bit polynomial hash (h = (a+1)·B + (b+1) mod 2^64, so
    (a+1, b) and (a, b−B) collide). With carry_window=True the finish
    groups on (hash, window bytes): the collision must NOT count as a
    shared span; hash-only grouping would wrongly report it."""
    import pandas as pd
    import pyarrow as pa

    from gamechanger_data_ray.stages.dedup import (
        _SPAN_BASE,
        span_partials,
        token_window_hashes,
    )

    a, b = 100, 200
    doc1 = np.array([a, b], dtype=np.int64)
    doc2 = np.array([a + 1, b - int(_SPAN_BASE)], dtype=np.int64)
    h1 = token_window_hashes(doc1, 2)
    h2 = token_window_hashes(doc2, 2)
    assert h1[0] == h2[0] and not np.array_equal(doc1, doc2)  # real collision

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "tokens": pa.array([doc1.tolist(), doc2.tolist()],
                                     pa.list_(pa.int64()))})
    p = span_partials(t, 2, carry_window=True)
    assert len(p) == 2 and p["span_hash"].nunique() == 1
    # hash-only grouping would see 2 docs; (hash, win) sees two singletons
    sz = p.groupby(["span_hash", "win"])["doc_id"].transform("size")
    assert (sz == 1).all()
    # identical windows across docs DO confirm
    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "tokens": pa.array([doc1.tolist(), doc1.tolist()],
                                      pa.list_(pa.int64()))})
    p2 = span_partials(t2, 2, carry_window=True)
    sz2 = p2.groupby(["span_hash", "win"])["doc_id"].transform("size")
    assert (sz2 == 2).all()
