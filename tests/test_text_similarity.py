"""Text-stage and similarity-stage verification (pure-python oracles for
the heuristic ops; brute-force recall for ANN)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from gamechanger_data_ray.stages import similarity as sim
from gamechanger_data_ray.stages.text import (
    TOKEN_PATTERN,
    Fingerprinter,
    LangId,
    QualityScorer,
    TokenCounter,
)


def test_token_counter_matches_re():
    tc = TokenCounter()
    df = pd.DataFrame({"text": ["hello, world 123!", "", "a-b c"]})
    out = tc(df.copy())
    expected = [len(re.findall(TOKEN_PATTERN, t)) for t in df["text"]]
    assert out["n_tokens"].tolist() == expected


def test_quality_scorer_basics():
    qs = QualityScorer()
    out = qs(pd.DataFrame({"text": ["the cat sat on the mat"]}))
    assert out["n_words"][0] == 6
    assert out["stopword_ratio"][0] == pytest.approx(3 / 6)  # the, on, the
    assert out["mean_word_len"][0] == pytest.approx((3 + 3 + 3 + 2 + 3 + 3) / 6)


def test_langid_deterministic():
    li = LangId()
    df = pd.DataFrame({"text": ["the thing and the other thing"] * 2})
    out = li(df.copy())
    assert out["lang_pred"].nunique() == 1
    assert out["lang_pred"][0] in {"en", "es", "fr", "de", "und"}


def test_fingerprint_properties():
    fp = Fingerprinter()
    df = pd.DataFrame({"text": ["abcdefgh" * 10, "abcdefgh" * 10, "zyxwvuts" * 10, "ab"]})
    out = fp(df.copy())
    f = out["fingerprint"].tolist()
    assert f[0] == f[1]  # deterministic
    assert f[0] != f[2]
    assert len(f[3]) == 16  # short-text fallback still fixed width

    # parity with a naive per-window Rabin-Karp oracle
    def naive_fp(s: str, k=8, base=257, mask=(1 << 61) - 1) -> str:
        b = s.encode()
        hashes = []
        for i in range(len(b) - k + 1):
            h = 0
            for j in range(k):
                h = (h * base + b[i + j]) & mask
            hashes.append(h)
        return f"{min(hashes):016x}"

    for s in ("abcdefgh" * 10, "the quick brown fox jumps over the lazy dog"):
        assert Fingerprinter()._fp(s) == naive_fp(s)


def brute_topk(m, qids, ids, k):
    mn = sim.normalize_rows(m)
    out = {}
    for qi, q in zip(qids, mn[: len(qids)]):
        sims = mn @ q
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
        out[qi] = [ids[i] for i in order if ids[i] != qi][:k]
    return out


def test_ivf_recall_vs_brute_force(sf_dir):
    """IVF with nprobe=3/16 buckets must recover most brute-force top-5."""
    from gamechanger_data_ray.pipelines.analysis_queries import ann_ivf, ann_topk_cosine

    exact = ann_topk_cosine(sf_dir)
    approx = ann_ivf(sf_dir)
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert np.mean(recalls) >= 0.5, f"mean IVF recall too low: {np.mean(recalls)}"


def test_kmeans_lite_deterministic():
    rng = np.random.default_rng(0)
    m = sim.normalize_rows(rng.normal(size=(200, 16)).astype(np.float32))
    c1 = sim.kmeans_lite(m, 8)
    c2 = sim.kmeans_lite(m, 8)
    assert np.allclose(c1, c2)


def test_multimodal_decoder_stub_contract():
    import pyarrow as pa

    from gamechanger_data_ray.stages import multimodal as mm

    t = mm.to_media_table([1, 2], [b"hello world", b""], "text/plain")
    assert t.schema.equals(mm.MEDIA_SCHEMA)
    dec = mm.FakeDecoder()
    out = dec(t)
    assert out["feature"].type == pa.list_(pa.float32(), 8)
    assert out["n_bytes"].to_pylist() == [11, 0]
    # base Decoder without a codec must refuse, not fake
    with pytest.raises(NotImplementedError):
        mm.Decoder().decode_one(b"x", "image/png")
    fs = mm.FrameSampler(stride=4, max_frames=3)
    frames = fs(out.select(["media_id", "n_bytes"]))
    # 11 bytes / stride 4 → 2 frames; empty payload → 1 sentinel frame
    assert frames["media_id"].to_pylist() == [1, 1, 2]
    assert frames["frame_idx"].to_pylist() == [0, 1, 0]


def test_lsh_recall_vs_brute_force(sf_dir):
    """Hyperplane LSH with hamming-1 multi-probe must recover a useful
    fraction of the brute-force top-5 (self-match is always recovered:
    a query's own bucket is probed)."""
    from gamechanger_data_ray.pipelines.analysis_queries import ann_lsh, ann_topk_cosine

    exact = ann_topk_cosine(sf_dir)
    approx = ann_lsh(sf_dir)
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert np.mean(recalls) >= 0.4, f"mean LSH recall too low: {np.mean(recalls)}"


def test_lsh_probe_codes():
    codes = sim.probe_codes(0b1010, 4, hamming=1)
    assert codes[0] == 0b1010 and len(codes) == 5
    assert set(codes) == {0b1010, 0b1011, 0b1000, 0b1110, 0b0010}


def test_pq_recall_vs_brute_force(sf_dir):
    """PQ-ADC over 8×uint8 codes (32× compression) must recover most of
    the brute-force top-5 — the compressed-corpus scale path."""
    from gamechanger_data_ray.pipelines.analysis_queries import ann_pq, ann_topk_cosine

    exact = ann_topk_cosine(sf_dir)
    approx = ann_pq(sf_dir)
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert np.mean(recalls) >= 0.5, f"mean PQ recall too low: {np.mean(recalls)}"


def test_pq_encode_roundtrip_properties():
    """Codes are deterministic, one byte per subspace, and ADC scores
    approximate true cosines (monotone enough to rank)."""
    rng = np.random.default_rng(3)
    m = sim.normalize_rows(rng.normal(size=(300, 64)))
    cb = sim.train_pq_codebooks(m, n_sub=8, n_cents=32)
    codes1, codes2 = sim.pq_encode(m, cb), sim.pq_encode(m, cb)
    assert codes1.dtype == np.uint8 and codes1.shape == (300, 8)
    assert (codes1 == codes2).all()
    # ADC approximation: reconstruct from codebooks, compare to true dot
    recon = np.concatenate(
        [cb[s][codes1[:, s]] for s in range(8)], axis=1
    )
    q = m[0]
    true = m @ q
    approx = recon @ q
    # mean absolute error small relative to the cosine range
    assert np.mean(np.abs(true - approx)) < 0.15


def test_embedding_dedup_both_adaptive_paths_exact(sf_dir):
    """embedding_dedup_cosine is size-adaptive; the ALL_ORACLES gate
    covers the default (small) path, so force the at-scale id-only
    fan-out + join-back path here and check it against the same SQL."""
    from gamechanger_data_ray.pipelines.analysis_queries import (
        ORACLES,
        embedding_dedup_cosine,
    )
    from tests.util_oracle import compare

    compare(
        lambda sf: embedding_dedup_cosine(sf, small_corpus_max=0),
        ORACLES["embedding_dedup_cosine"],
        sf_dir,
    )


def test_dedup_semantic_matches_serial_and_planted_copies(sf_dir):
    """dedup_semantic (SemDeDup shape): the distributed cluster-then-
    greedy result equals an independent serial recompute with the same
    sampled centroids, and the planted exact copies are exactly the
    removed set (each attributed to its original at cosine 1.0) —
    random corpus vectors are near-orthogonal, so nothing else trips
    tau=0.95."""
    import pyarrow.parquet as pq

    from gamechanger_data_ray.pipelines.analysis_queries import (
        _COPY_OFFSET,
        _KMEANS_SAMPLE,
        dedup_semantic,
    )

    got = dedup_semantic(sf_dir)

    # --- serial oracle, written independently of the pipeline code ---
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    step = max(1, len(ids) // _KMEANS_SAMPLE)
    cents = sim.kmeans_lite(m[ids % step == 0], 16)
    copy_mask = ids % 10 == 0
    all_ids = np.concatenate([ids, ids[copy_mask] + _COPY_OFFSET])
    all_m = np.vstack([m, m[copy_mask]])
    assign = np.argmax(all_m @ cents.T, axis=1)
    rows = []
    for c in sorted(set(assign.tolist())):
        sel = np.flatnonzero(assign == c)
        order = sel[np.argsort(all_ids[sel])]
        kept = []
        for i in order:
            if kept:
                sims = all_m[kept] @ all_m[i]
                j = int(np.argmax(sims))
                if sims[j] >= 0.95:
                    rows.append((int(all_ids[i]), int(all_ids[kept[j]]),
                                 round(float(sims[j]), 5)))
                    continue
            kept.append(i)
    exp = pd.DataFrame(rows, columns=["dup_id", "kept_as", "cosine"]
                       ).sort_values("dup_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # planted-copy contract
    planted = sorted(int(i) + _COPY_OFFSET for i in ids[copy_mask])
    assert got["dup_id"].tolist() == planted
    assert (got["kept_as"].to_numpy()
            == got["dup_id"].to_numpy() - _COPY_OFFSET).all()
    assert (got["cosine"] == 1.0).all()
