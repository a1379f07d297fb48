"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: per-batch numpy matmul against a broadcast
  query matrix (``ray.put`` once; read per actor, never per batch), local
  top-k per batch, tiny final reduce on the driver-side aggregate. The
  baseline path — exact, streaming, O(N·Q·d) flops, O(batches·Q·k) shuffle.
- IVF variant: deterministic k-means-lite centroids (seeded sample, few
  Lloyd iterations), vectors bucketed to nearest centroid, queries probe
  the ``nprobe`` nearest buckets — the scale path that avoids scanning the
  full corpus per query. Approximate: verified by recall tests, not a SQL
  oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _to_matrix(col) -> np.ndarray:
    """list<float> column (pandas object series or arrow) → (n, d) float64.

    float64 deliberately: the SQL oracle computes cosine on DOUBLE[] casts,
    and f64-vs-f64 agreement is ~1e-16 (vs ~1e-7 for f32 paths) — far from
    any 6-dp rounding boundary, so ranked output is bit-stable."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray)):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        return flat.reshape(n, -1).astype(np.float64)
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: per-batch local top-k cosine vs broadcast queries.

    Emits ≤ Q·k candidate rows per batch (query_id, vec_id, cosine);
    a final global top-k per query over the concatenated candidates gives
    the exact answer (top-k is a mergeable aggregate)."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        q = ray.get(queries_ref)  # {"ids": (Q,), "matrix": (Q, d) normalized}
        self.qids = q["ids"]
        self.qm = q["matrix"]
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_to_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = np.round(self.qm @ m.T, 6)  # (Q, n); ROUND BEFORE RANKING —
        # the oracle ranks on ROUND(cosine, 6) too, so near-ties order
        # identically (tie-break vec_id asc) instead of by f.p. noise
        self_mask = ids[None, :] == self.qids[:, None]
        sims = np.where(self_mask, -np.inf, sims)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            order = np.lexsort((ids, -sims[qi]))[:k]  # cosine desc, vec_id asc
            s = sims[qi][order]
            fin = np.isfinite(s)
            out_q.append(np.full(fin.sum(), self.qids[qi]))
            out_v.append(ids[order][fin])
            out_s.append(s[fin])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )


def global_topk(candidates: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final reduce over per-batch candidates: exact top-k per query with
    deterministic tie-break (cosine DESC, vec_id ASC)."""
    c = candidates.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
    return c.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def kmeans_lite(m: np.ndarray, n_clusters: int, iters: int = 5, seed: int = 99) -> np.ndarray:
    """Deterministic few-iteration Lloyd's on normalized vectors."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)
    cents = m[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class IVFAssigner:
    """map_batches stage: assign each vector to its nearest centroid
    (bucket column added; centroids broadcast once per actor)."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        self.cents = ray.get(centroids_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_to_matrix(batch[self.vec_col]))
        assign = np.argmax(m @ self.cents.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(assign))


class EmbeddingDupFinder:
    """Near-dup pairs by cosine ≥ tau: per-batch matmul against the
    broadcast full (normalized) matrix; emits (id_a < id_b, cosine).
    Exact O(N²/B) work split across batches; at 10^10 scale swap the
    broadcast side for the IVF-bucketed variant."""

    def __init__(self, all_ref, tau: float, id_col: str = "vec_id", vec_col: str = "embedding"):
        a = ray.get(all_ref)
        self.all_ids = a["ids"]
        self.all_m = a["matrix"]
        self.tau = tau
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_to_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = m @ self.all_m.T  # (n, N)
        ii, jj = np.where(sims >= self.tau)
        a, b = ids[ii], self.all_ids[jj]
        keep = a < b  # each unordered pair once, no self-pairs
        return pa.table(
            {
                "id_a": pa.array(a[keep]),
                "id_b": pa.array(b[keep]),
                "cosine": pa.array(sims[ii, jj][keep].astype(np.float64)),
            }
        )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic random hyperplanes for sign-bit LSH codes."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_planes, dim))
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def lsh_code(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Pack each vector's hyperplane sign bits into one int bucket code."""
    bits = (m @ planes.T) > 0  # (N, P)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


def probe_codes(code: int, n_planes: int, hamming: int = 1) -> list[int]:
    """Multi-probe set: the code itself plus all codes within the given
    hamming distance (1 → flip each single bit)."""
    out = [code]
    if hamming >= 1:
        out += [code ^ (1 << b) for b in range(n_planes)]
    return out


class LSHAssigner:
    """map_batches stage: add the hyperplane-LSH bucket code (planes
    broadcast once per actor) — the random-projection sibling of
    :class:`IVFAssigner`."""

    def __init__(self, planes_ref, vec_col: str = "embedding"):
        self.planes = ray.get(planes_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_to_matrix(batch[self.vec_col]))
        codes = lsh_code(m, self.planes).astype(np.int32)
        return batch.append_column("bucket", pa.array(codes))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-corpus ANN scale path:
# 64 f32 (256 B) per vector become n_sub uint8 codes (8 B at n_sub=8, 32×),
# so a 10^10-vector corpus's codes fit a fraction of the fleet's RAM and
# search never touches the raw embeddings after the one-time encode pass.
# ---------------------------------------------------------------------------


def kmeans_euclid(m: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 99) -> np.ndarray:
    """Deterministic few-iteration euclidean Lloyd's (PQ subspaces are
    NOT normalized, so cosine k-means would be wrong here)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)
    cents = m[np.sort(idx)].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = m[mask].mean(axis=0)
    return cents


def train_pq_codebooks(
    sample: np.ndarray, n_sub: int = 8, n_cents: int = 32, seed: int = 99
) -> np.ndarray:
    """Per-subspace codebooks (n_sub, n_cents, d/n_sub) trained on a
    BOUNDED normalized sample — same fixed-driver-memory contract as the
    IVF centroid training."""
    n, d = sample.shape
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by n_sub {n_sub}")
    subs = sample.reshape(n, n_sub, d // n_sub)
    return np.stack([
        kmeans_euclid(subs[:, s, :], n_cents, seed=seed + s) for s in range(n_sub)
    ])


def pq_encode(m: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, d) normalized vectors → (n, n_sub) uint8 nearest-centroid codes."""
    n = m.shape[0]
    n_sub, n_cents, d_sub = codebooks.shape
    subs = m.reshape(n, n_sub, d_sub)
    codes = np.empty((n, n_sub), dtype=np.uint8)
    for s in range(n_sub):
        # ||x-c||² argmin == argmax(x·c - ||c||²/2); one matmul per subspace
        dots = subs[:, s, :] @ codebooks[s].T
        codes[:, s] = np.argmax(dots - 0.5 * (codebooks[s] ** 2).sum(axis=1), axis=1)
    return codes


class PQEncoder:
    """map_batches stage: normalize + PQ-encode each vector (codebooks
    broadcast once per actor); emits (id, code binary) — the raw
    embedding column is DROPPED, which is the point."""

    def __init__(self, codebooks_ref, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.codebooks = ray.get(codebooks_ref)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_to_matrix(batch[self.vec_col]))
        codes = pq_encode(m, self.codebooks)
        n, n_sub = codes.shape
        raw = codes.tobytes()
        return pa.table({
            self.id_col: batch[self.id_col],
            "code": pa.array([raw[i * n_sub:(i + 1) * n_sub] for i in range(n)],
                             pa.binary()),
        })


class PQADCTopK:
    """map_batches stage over ENCODED rows: asymmetric distance
    computation — each actor precomputes per-query lookup tables
    LUT[q, s, c] = q_s · codebook[s, c] once in ``__init__``, then a
    batch's approximate cosines are pure uint8 gathers + sums (no float
    reconstruction, no raw vectors)."""

    def __init__(self, queries_ref, codebooks_ref, k: int):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        cb = ray.get(codebooks_ref)  # (n_sub, n_cents, d_sub)
        n_sub, n_cents, d_sub = cb.shape
        qm = q["matrix"].reshape(len(self.qids), n_sub, d_sub)
        # (Q, n_sub, n_cents)
        self.lut = np.einsum("qsd,scd->qsc", qm, cb)
        self.k = k
        self.n_sub = n_sub

    def __call__(self, batch: pa.Table) -> pa.Table:
        code_col = batch["code"]
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        buf = b"".join(code_col.to_pylist())
        codes = np.frombuffer(buf, dtype=np.uint8).reshape(-1, self.n_sub)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return self._score(ids, codes)

    def _score(self, ids: np.ndarray, codes: np.ndarray) -> pa.Table:
        n = len(ids)
        sims = np.empty((len(self.qids), n))
        for s in range(self.n_sub):
            contrib = self.lut[:, s, :][:, codes[:, s]]  # (Q, n)
            sims = contrib if s == 0 else sims + contrib
        sims = np.round(sims, 6)
        self_mask = ids[None, :] == self.qids[:, None]
        sims = np.where(self_mask, -np.inf, sims)
        k = min(self.k, n)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qids)):
            order = np.lexsort((ids, -sims[qi]))[:k]
            s_vals = sims[qi][order]
            fin = np.isfinite(s_vals)
            out_q.append(np.full(fin.sum(), self.qids[qi]))
            out_v.append(ids[order][fin])
            out_s.append(s_vals[fin])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cosine": pa.array(np.concatenate(out_s).astype(np.float64)),
        })


class PQEncodeADCTopK(PQADCTopK):
    """Fused encode + ADC score for ONE-SHOT searches: when the codes are
    not being persisted (the ad-hoc ann query path), encoding and scoring
    in the same actor pass drops a full object-store round-trip of the
    code column and a second actor-pool spin-up. The two-stage split
    (:class:`PQEncoder` → :class:`PQADCTopK`) remains the shape for a
    STORED compressed corpus, where the codes are the artifact."""

    def __init__(self, queries_ref, codebooks_ref, k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        super().__init__(queries_ref, codebooks_ref, k)
        self.codebooks = ray.get(codebooks_ref)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_to_matrix(batch[self.vec_col]))
        codes = pq_encode(m, self.codebooks)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return self._score(ids, codes)
