"""Deduplication stages: exact (hash-partitioned), MinHash+LSH near-dup,
SimHash near-dup, exact n-gram Jaccard verification.

Reference parity: the only dedup in gamechanger-data is exact version-hash
anti-join (``rpa/rpa_landing_zone_mover.py:100-129``, ``J4/J5``); the
near-dup family is the training-data-pipeline extension (SURVEY.md §7.2-8
and the graft brief).

Scale design:
- exact dedup = vectorized content-hash column + ONE groupby(hash) keeping
  the min key per group (combiner first: per-batch drop-dups);
- MinHash: signatures computed per batch (numpy, one pass), LSH banding
  explodes to (band, band_hash, doc_id) rows; the bucket groupby shuffles
  only (64+8)·N tiny rows, never text; candidate pairs are verified by
  signature agreement, so raw text never re-ships;
- buckets larger than ``max_bucket`` are dropped (logged in the output via
  the ``truncated`` marker convention): an all-identical hot bucket is a
  quadratic bomb — the cap is the skew guard.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

NUM_HASHES = 64
NUM_BANDS = 16  # 16 bands × 4 rows — τ ≈ (1/16)^(1/4) ≈ 0.5
_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    """Stable uint64 hash per shingle (md5-based, python-hash-free)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
            for s in shingles
        ],
        dtype=np.uint64,
    )


def word_shingles(text: str, k: int = 3) -> list[str]:
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


class MinHasher:
    """Per-batch MinHash signatures over word k-gram shingles.

    Universal-hash permutations h_i(x) = (a_i·x + b_i) mod 2^61-1 with
    coefficients drawn once per actor from a fixed seed — every actor in
    the pool computes identical signatures. Output: + ``sig`` column
    (fixed-size list<uint64> as list<int64> bits)."""

    def __init__(self, text_col: str = "text", k: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 60, size=NUM_HASHES, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 60, size=NUM_HASHES, dtype=np.uint64)
        self.text_col = text_col
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.k)
        if not sh:
            return np.zeros(NUM_HASHES, dtype=np.uint64)
        np.seterr(over="ignore")
        x = _hash_shingles(sh)  # (S,)
        # (H, S) = a[:,None]*x[None,:] + b  — one matmul-shaped pass
        hx = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return hx.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t).astype(np.int64) for t in batch[self.text_col]]
        out = batch[[c for c in batch.columns if c != self.text_col]].copy()
        out["sig"] = sigs
        return out


def lsh_bands(batch: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, doc_id) rows — the LSH
    bucketing shuffle payload (small fixed width; text never ships)."""
    rows_per_band = NUM_HASHES // NUM_BANDS
    ids, bands, bhashes = [], [], []
    for _, r in batch.iterrows():
        sig = np.asarray(r["sig"], dtype=np.uint64)
        for b in range(NUM_BANDS):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = int.from_bytes(hashlib.md5(chunk.tobytes()).digest()[:8], "little")
            ids.append(r[id_col])
            bands.append(b)
            bhashes.append(h - (1 << 63))  # to signed int64
    return pd.DataFrame({id_col: ids, "band_id": bands, "band_hash": bhashes})


def bucket_pairs(group: pd.DataFrame, id_col: str = "doc_id", max_bucket: int = 200) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket (group of equal
    (band_id, band_hash)). Buckets above ``max_bucket`` are truncated —
    the hot-bucket skew guard; raise NUM_BANDS or salt instead of paying
    O(n²) on a degenerate bucket."""
    ids = sorted(set(group[id_col].tolist()))[:max_bucket]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")})
    pairs = list(itertools.combinations(ids, 2))
    return pd.DataFrame({"id_a": [p[0] for p in pairs], "id_b": [p[1] for p in pairs]})


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(word_shingles(text_a, k)), set(word_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class SimHasher:
    """64-bit SimHash over word features (bit-vote of per-word stable
    hashes). Near-dups have small Hamming distance. Candidates are bucketed
    by the 4 × 16-bit chunks (a pair within Hamming ≤ 3 of a 64-bit hash
    shares at least one exact 16-bit chunk — pigeonhole)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def simhash(text: str) -> int:
        words = text.split()
        if not words:
            return 0
        votes = np.zeros(64, dtype=np.int64)
        uniq, counts = np.unique(np.array(words), return_counts=True)
        shifts = np.arange(64, dtype=np.uint64)
        for w, c in zip(uniq, counts):
            h = np.uint64(int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little"))
            bits = (h >> shifts) & np.uint64(1)
            votes += np.where(bits == 1, c, -c)
        return int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[c for c in batch.columns if c != self.text_col]].copy()
        out["simhash"] = [self.simhash(t) - (1 << 63) for t in batch[self.text_col]]
        return out


def simhash_chunks(batch: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Explode each simhash to its 4 × 16-bit chunks for bucketing."""
    ids, chunk_ids, chunk_vals, hashes = [], [], [], []
    for _, r in batch.iterrows():
        h = int(r["simhash"]) + (1 << 63)
        for c in range(4):
            ids.append(r[id_col])
            chunk_ids.append(c)
            chunk_vals.append((h >> (16 * c)) & 0xFFFF)
            hashes.append(r["simhash"])
    return pd.DataFrame(
        {id_col: ids, "chunk_id": chunk_ids, "chunk_val": chunk_vals, "simhash": hashes}
    )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
