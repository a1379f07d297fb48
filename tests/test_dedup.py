"""Dedup-stage verification against pure-python brute-force oracles."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from gamechanger_data_ray.stages import dedup as dd


@pytest.fixture(scope="module")
def corpus():
    """Deterministic corpus: 60 base docs + near-copies of 10 + exact copy."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    docs = {}
    for i in range(60):
        docs[i] = " ".join(rng.choice(vocab, size=40))
    for i in range(10):  # near-dups: drop last 4 words
        docs[1000 + i] = " ".join(docs[i].split()[:-4])
    docs[2000] = docs[0]  # exact dup
    return docs


def brute_pairs(docs, tau):
    out = set()
    for a, b in itertools.combinations(sorted(docs), 2):
        if dd.exact_jaccard(docs[a], docs[b]) >= tau:
            out.add((a, b))
    return out


def test_minhash_estimates_jaccard(corpus):
    mh = dd.MinHasher()
    sigs = {k: mh.signature(v) for k, v in corpus.items()}
    for a, b in [(0, 1000), (5, 1005), (0, 2000), (0, 1)]:
        est = dd.estimated_jaccard(sigs[a], sigs[b])
        exact = dd.exact_jaccard(corpus[a], corpus[b])
        assert abs(est - exact) < 0.25, (a, b, est, exact)


def test_minhash_identical_docs_full_match(corpus):
    mh = dd.MinHasher()
    assert dd.estimated_jaccard(mh.signature(corpus[0]), mh.signature(corpus[2000])) == 1.0


def test_lsh_recall_on_high_jaccard_pairs(corpus):
    """Every pair with exact Jaccard ≥ 0.8 must be found by LSH banding."""
    mh = dd.MinHasher()
    df = pd.DataFrame({"doc_id": list(corpus), "text": list(corpus.values())})
    sigs = mh(df.copy())
    bands = dd.lsh_bands(sigs)
    found = set()
    for _, g in bands.groupby(["band_id", "band_hash"]):
        p = dd.bucket_pairs(g)
        found.update(zip(p["id_a"], p["id_b"]))
    want = brute_pairs(corpus, 0.8)
    assert want, "fixture must contain high-jaccard pairs"
    missing = want - found
    assert not missing, f"LSH missed {missing}"


def test_simhash_near_dups_close_hamming(corpus):
    sh = dd.SimHasher()
    h0 = sh.simhash(corpus[0])
    h_near = sh.simhash(corpus[1000])
    h_far = sh.simhash(corpus[40])
    assert dd.hamming64(h0, h_near) < dd.hamming64(h0, h_far)
    assert dd.hamming64(h0, sh.simhash(corpus[2000])) == 0


def test_simhash_chunk_bucketing_catches_small_hamming(corpus):
    """Pigeonhole: hamming ≤ 3 pairs share ≥ 1 exact 16-bit chunk."""
    sh = dd.SimHasher()
    hashes = {k: sh.simhash(v) for k, v in corpus.items()}
    for a, b in itertools.combinations(sorted(corpus), 2):
        if dd.hamming64(hashes[a], hashes[b]) <= 3:
            chunks_a = [(hashes[a] >> (16 * c)) & 0xFFFF for c in range(4)]
            chunks_b = [(hashes[b] >> (16 * c)) & 0xFFFF for c in range(4)]
            assert any(x == y for x, y in zip(chunks_a, chunks_b))


def test_bucket_pairs_caps_degenerate_buckets():
    g = pd.DataFrame({"doc_id": list(range(500))})
    p = dd.bucket_pairs(g, max_bucket=50)
    assert len(p) == 50 * 49 // 2  # capped, not 500·499/2


def test_exact_jaccard_edges():
    assert dd.exact_jaccard("", "") == 1.0
    assert dd.exact_jaccard("a b c", "a b c") == 1.0
    assert dd.exact_jaccard("a b c d", "x y z w") == 0.0


def test_dedup_queries_find_seeded_pairs(sf_dir):
    """The seeded near-copies (doc_id + 100000) must be recovered."""
    from gamechanger_data_ray.pipelines.analysis_queries import (
        dedup_minhash_lsh,
    )

    mh = dedup_minhash_lsh(sf_dir)
    seeded = mh[mh["id_b"] == mh["id_a"] + 100_000]
    assert len(seeded) >= 40  # 50 seeded near-copies, high recall expected
    # exact-confirmed face: every reported pair really clears τ = 1/2
    assert (mh["n_inter"] * 2 >= mh["n_union"]).all()


def test_minhash_est_face_recall_precision(sf_dir):
    """The module-level signature-ESTIMATED variant: recovers the seeded
    near-copies and its est_jaccard tracks exact Jaccard (the pairs it
    emits are genuinely similar — precision via a loose exact floor)."""
    import pyarrow.parquet as pq

    from gamechanger_data_ray.pipelines.analysis_queries import (
        dedup_minhash_lsh_est,
    )
    from gamechanger_data_ray.stages import dedup as dd

    est = dedup_minhash_lsh_est(sf_dir)
    seeded = est[est["id_b"] == est["id_a"] + 100_000]
    assert len(seeded) >= 40
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    def text_of(i):
        base = texts[i % 100_000]
        return base if i < 100_000 else " ".join(base.split()[:-5])

    for _, r in est.head(50).iterrows():
        exact = dd.exact_jaccard(text_of(int(r["id_a"])), text_of(int(r["id_b"])))
        assert exact >= r["est_jaccard"] - 0.3, (r["id_a"], r["id_b"], exact)


def test_simhash_guaranteed_recall(sf_dir):
    """SimHash chunk-bucketing guarantees recall only for hamming ≤ 3
    (pigeonhole over 4 × 16-bit chunks); verify that guarantee exactly,
    plus that every emitted pair respects the hamming cutoff."""
    import pyarrow.parquet as pq

    from gamechanger_data_ray.pipelines.analysis_queries import dedup_simhash
    from gamechanger_data_ray.stages import dedup as dd

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    sh = dd.SimHasher()
    guaranteed = set()
    for d, txt in texts.items():
        if d % 10 == 0:
            pert = " ".join(txt.split()[:-5])
            if dd.hamming64(sh.simhash(txt), sh.simhash(pert)) <= 3:
                guaranteed.add((d, d + 100_000))
    simh = dedup_simhash(sf_dir)
    got = set(zip(simh["id_a"], simh["id_b"]))
    assert guaranteed, "fixture must contain hamming<=3 seeded pairs"
    assert guaranteed <= got, f"missed guaranteed pairs: {sorted(guaranteed - got)[:5]}"
    assert (simh["hamming"] <= 8).all()


def test_bands_with_sig_carry_and_bucket_est():
    """The sig-carrying band explode + in-bucket est-Jaccard must agree
    with the plain band explode + pairwise signature comparison."""
    import numpy as np
    import pandas as pd

    from gamechanger_data_ray.stages.dedup import (
        NUM_BANDS,
        MinHasher,
        bucket_pairs_est,
        estimated_jaccard,
        lsh_bands,
        lsh_bands_with_sig,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about distributed shuffles",
    ]
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts})
    sigs = MinHasher()(df)
    carried = lsh_bands_with_sig(sigs).to_pandas()
    plain = lsh_bands(sigs)
    # same bucketing rows
    pd.testing.assert_frame_equal(
        carried[["doc_id", "band_id", "band_hash"]].reset_index(drop=True),
        plain.reset_index(drop=True),
    )
    assert carried["sig"].map(len).eq(8 * 64).all()  # 64 packed u64s

    # identical docs share every band → est 1.0 from any bucket group
    g = carried[(carried["band_id"] == 0)]
    pairs = bucket_pairs_est(g, tau=0.0)
    row = pairs[(pairs["id_a"] == 1) & (pairs["id_b"] == 2)]
    assert len(row) == 1 and row["est_jaccard"].iloc[0] == 1.0
    # and the est matches the direct signature comparison for (1, 3)
    s1 = np.asarray(sigs["sig"].iloc[0], dtype=np.uint64)
    s3 = np.asarray(sigs["sig"].iloc[2], dtype=np.uint64)
    expect = estimated_jaccard(s1, s3)
    r13 = pairs[(pairs["id_a"] == 1) & (pairs["id_b"] == 3)]
    if len(r13):
        assert abs(r13["est_jaccard"].iloc[0] - expect) < 1e-12


def test_bucket_pairs_est_respects_tau_and_cap():
    import pandas as pd

    from gamechanger_data_ray.stages.dedup import MinHasher, bucket_pairs_est, lsh_bands_with_sig

    texts = ["alpha beta gamma delta epsilon zeta"] * 2 + ["eta theta iota kappa lambda mu"]
    sigs = MinHasher()(pd.DataFrame({"doc_id": [1, 2, 3], "text": texts}))
    g = lsh_bands_with_sig(sigs).to_pandas()
    g = g[g["band_id"] == 0]
    # tau=1.0 keeps only the exact-copy pair
    out = bucket_pairs_est(g, tau=1.0)
    assert out[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    # cap of 1 member → no pairs
    assert bucket_pairs_est(g, tau=0.0, max_bucket=1).empty


def test_dedup_clusters_links_near_copies(ray_session):
    """Every planted near-copy (doc_id+offset, last 5 words dropped) whose
    shared prefix still contains a full 8-gram must land in its original's
    cluster; cluster rep is the component min."""
    from gamechanger_data_ray.pipelines import analysis_queries as A

    out = (
        A.dedup_clusters("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("doc_id")["cluster"]
    )
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, len(string_split(text,' ')) AS n FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id % 10 = 0"
    ).df()
    for _, row in docs.iterrows():
        orig, n = int(row["doc_id"]), int(row["n"])
        copy = orig + A._COPY_OFFSET
        if (n - 5) // A._CC_STRIDE >= 1:  # prefix keeps >=1 full shingle
            assert out[copy] == out[orig]
    # cluster rep is a member of the cluster and is its min
    grp = out.reset_index().groupby("cluster")["doc_id"].min()
    for cluster, mn in grp.items():
        assert cluster == mn


def test_simhash_boilerplate_bucket_cap(tmp_path):
    """1000 near-identical boilerplate docs all land in the same chunk
    buckets; the max_bucket cap must keep the pair pass bounded instead
    of exploding to ~half a million Python pairs."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gamechanger_data_ray.pipelines.analysis_queries import dedup_simhash

    boiler = " ".join(f"w{i % 37}" for i in range(120))
    n = 1000
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "text": pa.array([boiler] * n),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t0 = time.monotonic()
    pairs = dedup_simhash(str(tmp_path), max_bucket=200)
    elapsed = time.monotonic() - t0
    # cap bounds output: <= C(200,2) per bucket, deduped across buckets
    assert 0 < len(pairs) <= 200 * 199 // 2
    assert (pairs["hamming"] == 0).all()
    assert elapsed < 60, f"bucket cap failed to bound the pair pass: {elapsed:.1f}s"


def test_span_removal_matches_serial_recompute(ray_session, tmp_path):
    """dedup_span_removal's distributed cut machinery == a naive serial
    sweep: seeded random corpus with planted cross-doc copies, within-doc
    repeats and overlapping duplicated windows."""
    import numpy as np
    import pyarrow.parquet as pq

    from gamechanger_data_ray.pipelines import analysis_queries as A

    import pyarrow as pa

    W = 8
    rng = np.random.default_rng(4242)
    docs: dict[int, np.ndarray] = {}
    for d in range(1, 41):
        docs[d] = rng.integers(0, 50, size=int(rng.integers(4, 60)), dtype=np.int64)
    shared = rng.integers(0, 50, size=W + 3, dtype=np.int64)  # overlapping dup windows
    for d in (3, 7, 20):
        docs[d] = np.concatenate([docs[d], shared, docs[d][:5]])
    docs[11] = np.concatenate([docs[11][:W], docs[11][:W], docs[11]])  # within-doc repeat

    # monkeypatch-free: drive the op through its own corpus generator by
    # writing a documents table whose doc_ids reproduce these lengths is
    # impossible — so test the machinery directly on a Dataset.
    import pandas as pd
    import ray as _ray

    import gamechanger_data_ray.pipelines.analysis_queries as mod

    corpus = pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "tokens": pa.array([docs[d].tolist() for d in sorted(docs)], pa.list_(pa.int32())),
    })
    orig = mod._arith_token_corpus
    mod._arith_token_corpus = lambda sf: _ray.data.from_arrow(corpus)
    try:
        out = A.dedup_span_removal("unused", window=W)
    finally:
        mod._arith_token_corpus = orig

    # serial oracle: global first occurrence by (doc, pos) survives
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(docs):
        t = docs[d]
        for j in range(len(t) - W + 1):
            occ.setdefault(tuple(t[j:j + W]), []).append((d, j))
    cut: dict[int, set[int]] = {d: set() for d in docs}
    for positions in occ.values():
        for (d, j) in sorted(positions)[1:]:
            cut[d].update(range(j, j + W))
    exp = []
    for d in sorted(docs):
        kept = np.array([v for j, v in enumerate(docs[d]) if j not in cut[d]],
                        dtype=np.int64)
        exp.append((d, kept.size, int(kept.sum()),
                    int((np.arange(1, kept.size + 1) * kept).sum())))
    exp_df = pd.DataFrame(exp, columns=["doc_id", "n_tok_kept", "tok_sum", "tok_wsum"])
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp_df)
    # the planted copies actually lost tokens
    assert (out.set_index("doc_id").loc[[7, 20], "n_tok_kept"].to_numpy()
            < np.array([len(docs[7]), len(docs[20])])).all()
