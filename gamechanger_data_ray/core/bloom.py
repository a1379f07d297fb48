"""Vectorized Bloom filter — the scale path for cumulative exact-dedup.

The reference keeps the full seen-version-hash set in memory per crawler
(``rpa/rpa_landing_zone_mover.py:229-257``); at 10^10 keys that set no
longer broadcasts. A Bloom filter does (fixed bits, e.g. 128 MiB for
10^10 keys @ ~1% FP), and dedup stays EXACT with a two-phase plan:
"definitely new" rows (bloom miss — the vast majority) pass straight
through; only "maybe seen" rows (bloom hit) go to the exact check, which
at scale is a shuffle join over that small subset.

Pure numpy: double hashing (Kirsch-Mitzenmacher) over a uint64 base hash,
bit array as a uint64 vector; add/contains are fully vectorized. Filters
OR-union, so per-batch partial filters reduce on the driver at fixed cost.
No false negatives ever (property-tested) — correctness never depends on
the FP rate, only the exact-check traffic does.
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)


@np.errstate(over="ignore")  # scoped, not process-global
def _h2(h: np.ndarray) -> np.ndarray:
    """Second hash for double hashing; odd so probes cycle all bits."""
    v = (h ^ (h >> np.uint64(33))) * _MIX
    return v | np.uint64(1)


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, k: int = 4):
        if n_bits % 64:
            raise ValueError("n_bits must be a multiple of 64")
        self.n_bits = np.uint64(n_bits)
        self.k = k
        self.bits = np.zeros(n_bits // 64, dtype=np.uint64)

    def add_many(self, hashes: np.ndarray) -> None:
        """Insert a uint64 hash array (vectorized over rows AND probes)."""
        h = hashes.astype(np.uint64)
        step = _h2(h)
        for i in range(self.k):
            idx = (h + np.uint64(i) * step) % self.n_bits
            np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean array: True = maybe present, False = DEFINITELY absent."""
        h = hashes.astype(np.uint64)
        step = _h2(h)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            idx = (h + np.uint64(i) * step) % self.n_bits
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return out

    def union(self, other: "BloomFilter") -> "BloomFilter":
        """OR-merge (the reduce step for per-batch partial filters)."""
        if other.n_bits != self.n_bits or other.k != self.k:
            raise ValueError("cannot union differently-shaped bloom filters")
        out = BloomFilter(int(self.n_bits), self.k)
        out.bits = self.bits | other.bits
        return out

    # -- sidecar serialization (per-partition negative-lookup blooms) -------

    def to_bytes(self) -> bytes:
        """16-byte header (n_bits, k as uint64 LE) + the bit vector."""
        head = np.array([int(self.n_bits), self.k], dtype="<u8").tobytes()
        return head + self.bits.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        head = np.frombuffer(raw[:16], dtype="<u8")
        out = cls(int(head[0]), int(head[1]))
        out.bits = np.frombuffer(raw[16:], dtype="<u8").astype(np.uint64)
        return out


def sized_for(n_keys: int, bits_per_key: int = 10, k: int = 4) -> BloomFilter:
    """A filter sized to ~1% FP for ``n_keys`` (10 bits/key, k=4),
    rounded up to a multiple of 64 bits."""
    n_bits = max(1024, ((n_keys * bits_per_key + 63) // 64) * 64)
    return BloomFilter(n_bits, k)
