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

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

NUM_HASHES = 64
NUM_BANDS = 16  # 16 bands × 4 rows — τ ≈ (1/16)^(1/4) ≈ 0.5
_MERSENNE = np.uint64((1 << 61) - 1)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    """Stable uint64 hash per shingle — vectorized FNV-1a over the whole
    shingle list at once (no per-string Python hashing)."""
    import pyarrow as _pa

    from ..core.hashing import fnv1a64

    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return fnv1a64(_pa.array(shingles, _pa.string()))


def word_shingles(text: str, k: int = 3) -> list[str]:
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


class MinHasher:
    """Per-batch MinHash signatures over word k-gram shingles.

    Universal-hash permutations h_i(x) = (a_i·x + b_i) mod 2^61-1 with
    coefficients drawn once per actor from a fixed seed — every actor in
    the pool computes identical signatures. The whole batch is hashed in
    one vectorized pass: all shingles FNV-hashed at once, the (H × S_total)
    permutation matrix computed in one numpy expression, per-doc minima via
    ``np.minimum.reduceat`` segment reduction. Output: + ``sig`` column."""

    def __init__(self, text_col: str = "text", k: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 60, size=NUM_HASHES, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 60, size=NUM_HASHES, dtype=np.uint64)
        self.text_col = text_col
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    @np.errstate(over="ignore")  # scoped, not process-global
    def signatures(self, texts: list[str]) -> np.ndarray:
        """(N, NUM_HASHES) uint64 signature matrix for a list of texts."""
        sh_lists = [word_shingles(t, self.k) for t in texts]
        counts = np.array([len(s) for s in sh_lists], dtype=np.int64)
        flat = [s for lst in sh_lists for s in lst]
        out = np.zeros((len(texts), NUM_HASHES), dtype=np.uint64)
        if not flat:
            return out
        x = _hash_shingles(flat)  # (S_total,)
        hx = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE  # (H, S)
        nonempty = counts > 0
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        # reduceat needs strictly valid segment starts → reduce over the
        # non-empty docs only, then scatter back
        starts = offsets[nonempty]
        mins = np.minimum.reduceat(hx, starts, axis=1)  # (H, N_nonempty)
        out[nonempty] = mins.T
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(batch[self.text_col].tolist()).astype(np.int64)
        out = batch[[c for c in batch.columns if c != self.text_col]].copy()
        out["sig"] = list(sigs)
        return out


@np.errstate(over="ignore")  # scoped, not process-global
def lsh_bands(batch: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, doc_id) rows — the LSH
    bucketing shuffle payload (small fixed width; text never ships).
    Vectorized: the (N, BANDS, 4) signature cube is FNV-combined along the
    last axis in four numpy passes."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"), "band_id": pd.Series([], dtype="int64"),
             "band_hash": pd.Series([], dtype="int64")}
        )
    rows_per_band = NUM_HASHES // NUM_BANDS
    sigs = np.vstack([np.asarray(s, dtype=np.uint64) for s in batch["sig"]])
    cube = sigs.reshape(n, NUM_BANDS, rows_per_band)
    h = np.full((n, NUM_BANDS), _FNV_OFFSET, dtype=np.uint64)
    for j in range(rows_per_band):
        v = cube[:, :, j]
        # mix each uint64 value bytewise-equivalent: xor-multiply twice
        h = (h ^ v) * _FNV_PRIME
        h = (h ^ (v >> np.uint64(32))) * _FNV_PRIME
    return pd.DataFrame(
        {
            id_col: np.repeat(batch[id_col].to_numpy(), NUM_BANDS),
            "band_id": np.tile(np.arange(NUM_BANDS, dtype=np.int64), n),
            "band_hash": h.reshape(-1).view(np.int64),
        }
    )


class TokenMinHasher:
    """MinHash over token-ID k-gram shingles — near-dup detection on the
    tokens payload table itself (BASELINE.json input_hint shape), fully
    vectorized: sliding k-windows over the flattened int32 token values
    are FNV-mixed with k shifted gathers (no Python per row or per token),
    then the same permutation + segment-min machinery as text MinHash.

    Input: pyarrow batch with ``id_col`` and a list<int> ``tokens_col``.
    Output: (id, sig) pandas frame compatible with :func:`lsh_bands`."""

    def __init__(self, id_col: str = "doc_id", tokens_col: str = "tokens",
                 k: int = 5, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 60, size=NUM_HASHES, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 60, size=NUM_HASHES, dtype=np.uint64)
        self.id_col = id_col
        self.tokens_col = tokens_col
        self.k = k

    @np.errstate(over="ignore")  # scoped, not process-global
    def _window_hashes(self, vals: np.ndarray, starts: np.ndarray) -> np.ndarray:
        h = np.full(len(starts), _FNV_OFFSET, dtype=np.uint64)
        for j in range(self.k):
            v = vals[starts + j].astype(np.uint64)
            h = (h ^ v) * _FNV_PRIME
            h = (h ^ (v >> np.uint64(16))) * _FNV_PRIME
        return h

    @np.errstate(over="ignore")  # scoped, not process-global
    def signatures_from_lists(self, token_lists) -> np.ndarray:
        """(N, NUM_HASHES) signatures from a pyarrow ListArray/ChunkedArray."""
        if isinstance(token_lists, pa.ChunkedArray):
            token_lists = token_lists.combine_chunks()
        offsets = token_lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        vals = token_lists.flatten().to_numpy(zero_copy_only=False)
        lens = offsets[1:] - offsets[:-1]
        win_counts = np.maximum(lens - self.k + 1, 0)
        n = len(lens)
        out = np.zeros((n, NUM_HASHES), dtype=np.uint64)
        total = int(win_counts.sum())
        if total == 0:
            return out
        # start index of every valid window, across all docs, vectorized
        doc_of_win = np.repeat(np.arange(n), win_counts)
        intra = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(win_counts)[:-1])), win_counts
        )
        starts = offsets[:-1][doc_of_win] + intra
        x = self._window_hashes(vals, starts)  # (W_total,)
        hx = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        nonempty = win_counts > 0
        seg_starts = np.concatenate(([0], np.cumsum(win_counts)[:-1]))[nonempty]
        mins = np.minimum.reduceat(hx, seg_starts, axis=1)
        out[nonempty] = mins.T
        return out

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        sigs = self.signatures_from_lists(batch[self.tokens_col]).astype(np.int64)
        ids = batch[self.id_col].to_pandas()
        return pd.DataFrame({self.id_col: ids, "sig": list(sigs)})


def token_shingle_jaccard(a, b, k: int = 5) -> float:
    """Exact Jaccard of token k-gram shingle sets (test oracle)."""
    ta, tb = list(a), list(b)
    sa = {tuple(ta[i : i + k]) for i in range(max(0, len(ta) - k + 1))}
    sb = {tuple(tb[i : i + k]) for i in range(max(0, len(tb) - k + 1))}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def lsh_bands_with_sig(batch: pd.DataFrame, id_col: str = "doc_id") -> pa.Table:
    """Band explode that CARRIES the packed signature on every band row
    (binary, 8·NUM_HASHES bytes): the est-Jaccard verify then happens
    inside the bucket groupby itself — no driver-side signature map, no
    extra join stages. Shuffle payload grows by NUM_BANDS×512 B per doc
    (still constant per doc, text never ships). Arrow-typed output so
    chained shuffles keep exact dtypes."""
    base = lsh_bands(batch, id_col)
    n = len(batch)
    if n == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "band_id": pa.array([], pa.int64()),
             "band_hash": pa.array([], pa.int64()), "sig": pa.array([], pa.binary())}
        )
    packed = [np.asarray(s, dtype=np.uint64).tobytes() for s in batch["sig"]]
    return pa.table(
        {
            id_col: pa.array(base[id_col]),
            "band_id": pa.array(base["band_id"], pa.int64()),
            "band_hash": pa.array(base["band_hash"], pa.int64()),
            "sig": pa.array(np.repeat(np.array(packed, dtype=object), NUM_BANDS), pa.binary()),
        }
    )


def bucket_pairs_est(
    group: pd.DataFrame, id_col: str = "doc_id", tau: float = 0.0, max_bucket: int = 200
) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket with the signature-estimated
    Jaccard computed IN PLACE from the carried sigs (vectorized pairwise
    compare over ≤max_bucket members). Pairs found in several buckets are
    deduped by the caller on the (small) result."""
    g = group.drop_duplicates(id_col).iloc[:max_bucket]
    ids = g[id_col].to_numpy()
    if len(ids) < 2:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype=g[id_col].dtype if len(g) else "int64"),
             "id_b": pd.Series(dtype=g[id_col].dtype if len(g) else "int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
    order = np.argsort(ids)
    ids = ids[order]
    sigs = np.vstack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"].to_numpy()[order]])
    ii, jj = np.triu_indices(len(ids), k=1)
    est = (sigs[ii] == sigs[jj]).mean(axis=1)
    keep = est >= tau
    return pd.DataFrame({"id_a": ids[ii][keep], "id_b": ids[jj][keep], "est_jaccard": est[keep]})


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
    shares at least one exact 16-bit chunk — pigeonhole).

    Vectorized per batch: every word of every doc FNV-hashed in one pass,
    the (W_total, 64) bit-vote matrix segment-summed per doc with
    ``np.add.reduceat``."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.shifts = np.arange(64, dtype=np.uint64)

    @np.errstate(over="ignore")  # scoped, not process-global
    def simhashes(self, texts: list[str]) -> np.ndarray:
        word_lists = [t.split() for t in texts]
        counts = np.array([len(w) for w in word_lists], dtype=np.int64)
        flat = [w for lst in word_lists for w in lst]
        out = np.zeros(len(texts), dtype=np.uint64)
        if not flat:
            return out
        import pyarrow as _pa

        from ..core.hashing import fnv1a64

        h = fnv1a64(_pa.array(flat, _pa.string()))  # (W_total,)
        bits = ((h[:, None] >> self.shifts[None, :]) & np.uint64(1)).astype(np.int32)
        contrib = bits * 2 - 1  # ±1 votes
        nonempty = counts > 0
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        votes = np.add.reduceat(contrib, offsets[nonempty], axis=0)  # (N_ne, 64)
        sims = ((votes > 0).astype(np.uint64) << self.shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[nonempty] = sims
        return out

    def simhash(self, text: str) -> int:
        return int(self.simhashes([text])[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[c for c in batch.columns if c != self.text_col]].copy()
        sims = self.simhashes(batch[self.text_col].tolist())
        out["simhash"] = sims.view(np.int64)
        return out


def simhash_chunks(batch: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Explode each simhash to its 4 × 16-bit chunks for bucketing."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"), "chunk_id": pd.Series([], dtype="int64"),
             "chunk_val": pd.Series([], dtype="int64"), "simhash": pd.Series([], dtype="int64")}
        )
    h = batch["simhash"].to_numpy(dtype=np.int64).view(np.uint64)  # undo signed view
    chunks = np.stack(
        [(h >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(4)], axis=1
    )  # (n, 4)
    return pd.DataFrame(
        {
            id_col: np.repeat(batch[id_col].to_numpy(), 4),
            "chunk_id": np.tile(np.arange(4, dtype=np.int64), n),
            "chunk_val": chunks.reshape(-1).astype(np.int64),
            "simhash": np.repeat(batch["simhash"].to_numpy(), 4),
        }
    )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# Routed bucket processing — shuffle-group granularity decoupled from
# bucket granularity
# ---------------------------------------------------------------------------

NUM_ROUTES = 1024  # shuffle groups for the bucket pass (≈32 per cpu at 32)


def with_route(
    t: pa.Table, cols: tuple[str, str] = ("band_id", "band_hash")
) -> pa.Table:
    """Coarse deterministic shuffle key over a two-column bucket id: all
    rows of one bucket share a route, each route carries MANY buckets.
    Grouping the bucket pass by route instead of by bucket keeps the
    number of map_groups calls at NUM_ROUTES (vectorized multi-bucket
    processing inside) rather than one per bucket — at web scale the
    bucket count is ~docs×bands and per-group call overhead dominates."""
    a = t[cols[0]].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = t[cols[1]].to_numpy(zero_copy_only=False).astype(np.uint64)
    mixed = (b ^ (a * np.uint64(0x9E3779B97F4A7C15))) * _FNV_PRIME
    # strip the b'pandas' schema metadata the pandas→arrow boundary
    # attaches: pyarrow 16's Schema.__hash__ raises on metadata, which
    # makes the downstream shuffle's schema-dedup fall back (extra
    # serialization + 'Failed to hash the schemas' worker spam)
    t = t.replace_schema_metadata(None)
    return t.append_column(
        "route", pa.array((mixed % np.uint64(NUM_ROUTES)).astype(np.int64), pa.int64())
    )


def routed_bucket_pairs(
    group: pd.DataFrame, id_col: str = "doc_id", max_bucket: int = 200
) -> pd.DataFrame:
    """Plain CANDIDATE pairs within one ROUTE group (no signature
    estimate — the exact-confirm pipeline re-scores candidates against
    the raw shingle sets downstream): a vectorized ``duplicated`` mask
    drops singleton buckets in one pass, then the few real buckets run
    :func:`bucket_pairs` each."""
    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )
    g = group[group.duplicated(["band_id", "band_hash"], keep=False)]
    if g.empty:
        return empty
    out = [
        bucket_pairs(sub, id_col, max_bucket)
        for _, sub in g.groupby(["band_id", "band_hash"], sort=False)
    ]
    out = [o for o in out if len(o)]
    return pd.concat(out, ignore_index=True) if out else empty


def routed_bucket_pairs_est(
    group: pd.DataFrame, id_col: str = "doc_id", tau: float = 0.0, max_bucket: int = 200
) -> pd.DataFrame:
    """All candidate pairs within one ROUTE group: a vectorized
    ``duplicated`` mask drops singleton buckets (the overwhelming
    majority) in one pass, then the few real buckets run
    :func:`bucket_pairs_est` each."""
    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "est_jaccard": pd.Series(dtype="float64")}
    )
    g = group[group.duplicated(["band_id", "band_hash"], keep=False)]
    if g.empty:
        return empty
    out = [
        bucket_pairs_est(sub, id_col, tau, max_bucket)
        for _, sub in g.groupby(["band_id", "band_hash"], sort=False)
    ]
    out = [o for o in out if len(o)]
    return pd.concat(out, ignore_index=True) if out else empty


# ---------------------------------------------------------------------------
# Exact repeated token-span detection (the "Deduplicating Training Data
# Makes Language Models Better" substring-dedup shape, windowed): every
# W-token window gets a 64-bit polynomial rolling hash; windows whose hash
# repeats across ≥2 documents are repeated spans. At 10^10-window scale a
# 64-bit hash admits rare birthday collisions — ``carry_window=True``
# ships each (hash, doc)'s first window tokens so the (co-located) finish
# confirms token equality by grouping on (hash, window bytes); a crafted
# collision test proves the confirm rejects hash-equal/token-unequal
# windows. The tests also verify against a naive oracle.
# ---------------------------------------------------------------------------

_SPAN_BASE = np.uint64(0x100000001B3)


@np.errstate(over="ignore")  # scoped, not process-global
def token_window_hashes(tokens: np.ndarray, window: int) -> np.ndarray:
    """All W-token windows of one doc → uint64 polynomial hashes
    (vectorized: one sliding-window view + one matvec, no Python loop
    over windows)."""
    if len(tokens) < window:
        return np.empty(0, dtype=np.uint64)
    powers = np.empty(window, dtype=np.uint64)
    powers[-1] = np.uint64(1)
    for i in range(window - 2, -1, -1):
        powers[i] = powers[i + 1] * _SPAN_BASE
    wins = np.lib.stride_tricks.sliding_window_view(
        tokens.astype(np.uint64), window
    )
    # +1 so token id 0 contributes; wrap-around multiply is the hash
    return ((wins + np.uint64(1)) * powers[None, :]).sum(axis=1)


def span_partials(
    t,
    window: int,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    carry_window: bool = False,
):
    """Per-batch combiner for span dedup: one (span_hash, doc_id, occ)
    row per distinct hash per doc — the doc loop is per-document, the
    window hashing inside it is vectorized.

    ``carry_window=True`` additionally ships the FIRST window's raw
    tokens (``win``, 4·W bytes) so the finish can group on
    (hash, actual tokens) — the exact-confirm step that removes the
    64-bit birthday-collision caveat at 10^10-window scale, for ~5×
    the (tiny) partial-row bytes."""
    import pandas as pd
    import pyarrow as pa

    col = t[tok_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    ids = t[id_col].to_pylist()
    out_h, out_d, out_c, out_w = [], [], [], []
    for i, did in enumerate(ids):
        toks = flat[offs[i]:offs[i + 1]]
        h = token_window_hashes(toks, window)
        if len(h) == 0:
            continue
        uniq, first_idx, counts = np.unique(h, return_index=True, return_counts=True)
        out_h.append(uniq)
        out_d.extend([did] * len(uniq))
        out_c.append(counts)
        if carry_window:
            wins = np.lib.stride_tricks.sliding_window_view(
                toks.astype("<u4"), window
            )[first_idx]
            out_w.extend(np.ascontiguousarray(wins)[j].tobytes() for j in range(len(uniq)))
    if not out_h:
        cols = {"span_hash": pd.Series(dtype="int64"),
                "doc_id": pd.Series(dtype="object"),
                "occ": pd.Series(dtype="int64")}
        if carry_window:
            cols["win"] = pd.Series(dtype="object")
        return pd.DataFrame(cols)
    cols = {
        "span_hash": np.concatenate(out_h).astype(np.int64),  # u64 bits as i64
        "doc_id": out_d,
        "occ": np.concatenate(out_c).astype(np.int64),
    }
    if carry_window:
        cols["win"] = out_w
    return pd.DataFrame(cols)


def span_occurrence_partials(
    t,
    window: int,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
):
    """Per-batch combiner for span REMOVAL (the output stage of Lee et
    al. 2021 — not just detection): one row per distinct (window-hash,
    doc) carrying EVERY occurrence start position (``pos``, little-endian
    int32 bytes — bytes, not list cells, so the routed sort exchange
    never sees ndarray-valued pandas columns) plus the first window's raw
    tokens (``win``, the exact-confirm bytes, same contract as
    :func:`span_partials`).

    Scale note: vs the counting partial this ships ~4 bytes per window
    occurrence plus the 4·W confirm bytes per distinct window — the
    honest price of emitting removal coordinates. The doc loop is
    per-document; grouping inside it is one stable argsort."""
    import pandas as pd
    import pyarrow as pa

    col = t[tok_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    ids = t[id_col].to_pylist()
    out_h, out_d, out_w, out_p = [], [], [], []
    for i, did in enumerate(ids):
        toks = flat[offs[i]:offs[i + 1]]
        h = token_window_hashes(toks, window)
        if len(h) == 0:
            continue
        order = np.argsort(h, kind="stable")  # stable ⇒ ascending pos per hash
        sh = h[order]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        bounds = np.r_[starts, len(sh)]
        wins = np.lib.stride_tricks.sliding_window_view(toks.astype("<u4"), window)
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            pos = order[lo:hi]
            out_h.append(sh[lo])
            out_d.append(did)
            out_w.append(np.ascontiguousarray(wins[pos[0]]).tobytes())
            out_p.append(pos.astype("<i4").tobytes())
    if not out_h:
        return pd.DataFrame({
            "span_hash": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="object"),
            "win": pd.Series(dtype="object"),
            "pos": pd.Series(dtype="object"),
        })
    return pd.DataFrame({
        "span_hash": np.asarray(out_h, dtype=np.uint64).astype(np.int64),
        "doc_id": out_d,
        "win": out_w,
        "pos": out_p,
    })
