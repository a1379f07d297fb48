"""Checkpointed incremental consumption over the ``events`` stream table —
the S2/ST7 checkpoint-tail pattern exercised on driver testdata.

``events_checkpoint_incremental`` splits the stream into three
time-ordered micro-batches (the timestamped-prefix analog,
``checkpoint/utils.py:104-119``), maintains an incremental per-user count
state + watermark across batches, and returns the final state — which must
equal the full recompute (the DuckDB oracle). Crash-resume is modeled by
the watermark: a batch is only folded in if its upper ts bound is beyond
the watermark, and refolding an already-processed batch is a no-op.

``hash_antijoin_incremental`` is the J4 cumulative version-hash dedup
(``rpa/rpa_landing_zone_mover.py:100-129``): only second-half events whose
content hash was never seen in the first half survive.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..core.hashing import version_hash_column
from . import common as cm

ORACLES: dict[str, str] = {}

_BOUND_BINS = 4096


def _ts_batch_bounds(sf_dir: str, num_batches: int) -> list[int]:
    """Micro-batch boundaries as int64 microsecond timestamps,
    ``[min, e1, ..., max]``, derived fully distributed: one aggregate
    pass for min/max, one histogram-combiner pass (fixed ``_BOUND_BINS``
    counts per batch, summed on the driver) for approximate quantile
    edges. The driver never sees the ts column."""
    import numpy as np
    from ray.data.aggregate import Max, Min

    ds = cm.read(sf_dir, "events", columns=["ts"])
    mm = ds.aggregate(Min("ts"), Max("ts"))
    lo = int(pd.Timestamp(mm["min(ts)"]).value // 1000)  # ns → us
    hi = int(pd.Timestamp(mm["max(ts)"]).value // 1000)
    if num_batches <= 1 or hi <= lo:
        return [lo] + [hi] * num_batches
    width = max(1, -(-(hi - lo + 1) // _BOUND_BINS))

    def hist_partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        counts = np.bincount((v - lo) // width, minlength=_BOUND_BINS)
        return pa.table({"hist": pa.array([counts.tolist()], pa.list_(pa.int64()))})

    hist = np.zeros(_BOUND_BINS, dtype=np.int64)
    for b in ds.map_batches(hist_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for h in b["hist"].to_pylist():
            hist += np.asarray(h, dtype=np.int64)
    cum = hist.cumsum()
    total = int(cum[-1])
    edges = [lo]
    for i in range(1, num_batches):
        rank = -(-total * i // num_batches)  # ceil
        bin_idx = int(np.searchsorted(cum, rank))
        # inclusive upper edge of the chosen bin, clamped inside (lo, hi)
        edges.append(min(hi - 1, lo + (bin_idx + 1) * width - 1))
    edges.append(hi)
    # histogram edges are approximate: enforce strict monotonicity so
    # every (lo, hi] range is non-degenerate
    for i in range(1, len(edges)):
        edges[i] = max(edges[i], edges[i - 1] + (0 if i == 0 else 1))
    edges[-1] = hi
    return edges


def events_checkpoint_incremental(sf_dir: str, num_batches: int = 3):
    """Incremental per-user event counts maintained across checkpointed
    micro-batches; returns the converged state (== full groupby)."""
    state_dir = tempfile.mkdtemp(prefix="gcdr_ckpt_", dir="/tmp")
    try:
        ckpt_path = os.path.join(state_dir, "checkpoint.json")
        state: pd.DataFrame | None = None

        # batch boundaries: DISTRIBUTED approximate ts quantiles. A
        # min/max prepass bounds the domain, then per-batch fixed-bin
        # integer histograms (the ntok_quantiles bincount combiner
        # generalized to an unbounded domain) are summed on the driver —
        # O(num_bins) driver rows, never the ts column. Boundary placement
        # only balances the micro-batches; correctness holds for ANY
        # edges because the (lo, hi] ranges partition [min, max].
        qs = _ts_batch_bounds(sf_dir, num_batches)

        watermark = None
        for b in range(num_batches):
            lo, hi = qs[b], qs[b + 1]
            if watermark is not None and hi <= watermark:
                continue  # already folded (resume no-op)

            ds = cm.read(sf_dir, "events", columns=["user_id", "ts"])

            def in_range(t: pa.Table, lo=lo, hi=hi, first=(b == 0)) -> pa.Table:
                ts_us = pc.cast(t["ts"], pa.int64())
                lower = (
                    pc.greater_equal(ts_us, pa.scalar(lo))
                    if first
                    else pc.greater(ts_us, pa.scalar(lo))
                )
                return t.filter(pc.and_(lower, pc.less_equal(ts_us, pa.scalar(hi))))

            batch_ds = ds.map_batches(in_range, batch_format="pyarrow")
            delta = cm.partial_groupby_sum(batch_ds, keys=["user_id"], sums={}, counts="n")
            if state is None:
                state = delta
            else:
                state = (
                    pd.concat([state, delta], ignore_index=True)
                    .groupby("user_id", as_index=False)["n"]
                    .sum()
                )
            watermark = hi
            with open(ckpt_path, "w") as f:  # watermark durably advanced per batch
                json.dump({"watermark": str(watermark), "batch": b}, f)

        return state.sort_values("user_id").reset_index(drop=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


ORACLES["events_checkpoint_incremental"] = """
SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id ORDER BY user_id
"""


def hash_antijoin_incremental(sf_dir: str):
    """Cumulative content-hash anti-join (J4): events in the second half of
    the stream (by event_id) whose sha256(user_id|event_type) was already
    seen in the first half are dropped as duplicate deliveries.

    This is the DIRECT form — the seen-set collects on the driver and
    broadcasts, O(distinct keys) driver memory, fine up to ~10^7 keys.
    The 10^10-key path is :func:`hash_antijoin_bloom` (registered):
    OR-reduced partial Bloom partials prune map-side, then ONLY the
    maybe-seen minority joins distributed — kept here as the readable
    contrast the bloom docstring refers back to."""
    mid_tbl = cm.read_arrow(sf_dir, "events", columns=["event_id"])
    ids = pd.Series(mid_tbl["event_id"].to_pandas())
    mn, mx = int(ids.min()), int(ids.max())
    mid = mn + (mx - mn) // 4  # first quartile = the "already ingested" base

    first = cm.read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def hash_first(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["event_id"], pa.scalar(mid)))
        return pa.table({"h": version_hash_column(t, ["user_id", "event_type"])})

    seen = set()
    for b in first.map_batches(hash_first, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        seen.update(b["h"].to_pylist())
    seen_ref = cm.broadcast(sorted(seen))

    second = cm.read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def anti(t: pa.Table) -> pa.Table:
        import ray as _ray

        t = t.filter(pc.greater(t["event_id"], pa.scalar(mid)))
        h = version_hash_column(t, ["user_id", "event_type"])
        mask = pc.invert(pc.is_in(h, value_set=pa.array(_ray.get(seen_ref))))
        return t.filter(mask).select(["event_id", "user_id", "event_type"])

    return second.map_batches(anti, batch_format="pyarrow")


ORACLES["hash_antijoin_incremental"] = """
WITH mid AS (SELECT MIN(event_id) + (MAX(event_id) - MIN(event_id)) // 4 AS m FROM events),
first_hashes AS (
  SELECT DISTINCT sha256(CAST(user_id AS VARCHAR) || '|' || event_type) AS h
  FROM events, mid WHERE event_id <= m
)
SELECT event_id, user_id, event_type
FROM events, mid
WHERE event_id > m
  AND sha256(CAST(user_id AS VARCHAR) || '|' || event_type) NOT IN (SELECT h FROM first_hashes)
"""


def hash_antijoin_bloom(sf_dir: str, _stats: dict | None = None):
    """The same cumulative-hash anti-join, two-phase for 10^10-key scale,
    with BOTH phases distributed:

    phase 0: per-batch partial Bloom filters of the first-half (already
             ingested) hashes, OR-reduced on the driver — each partial is
             a fixed 8 KiB bitset, so driver traffic is O(#batches),
             never O(keys) — and broadcast;
    phase 1: second-half rows the filter rejects are DEFINITELY new and
             pass with no further work (a pure map-side filter);
    phase 2: ONLY the maybe-seen minority (true dups + Bloom false
             positives) runs the exact check, as a ``left_anti``
             :func:`~..pipelines.joins.bucketed_hash_join` against the
             first-half hash rows — one co-shuffle of the skinny hash
             column vs. the minority subset. No exact seen-set ever
             lands on the driver.

    Result is exact — identical oracle as
    :func:`hash_antijoin_incremental` — regardless of the FP rate; the
    FP rate only sizes the phase-2 shuffle. ``_stats`` (tests) receives
    the phase sizes to prove the minority, not the corpus, enters the
    join. Reference analog: ``rpa/rpa_landing_zone_mover.py:100-129``."""
    from ..core.bloom import BloomFilter
    from ..core.hashing import fnv1a64
    from .joins import bucketed_hash_join

    mid_tbl = cm.read_arrow(sf_dir, "events", columns=["event_id"])
    ids = pd.Series(mid_tbl["event_id"].to_pandas())
    mn, mx = int(ids.min()), int(ids.max())
    mid = mn + (mx - mn) // 4

    def hash_first(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["event_id"], pa.scalar(mid)))
        return pa.table({"h": version_hash_column(t, ["user_id", "event_type"])})

    first = cm.read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    bloom = BloomFilter(n_bits=1 << 16, k=4)
    for b in first.map_batches(hash_first, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hs = b["h"]
        bloom.add_many(fnv1a64(hs.combine_chunks() if isinstance(hs, pa.ChunkedArray) else hs))
    bloom_ref = cm.broadcast(bloom)

    cols = ["event_id", "user_id", "event_type"]

    def second_half_hashed(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["event_id"], pa.scalar(mid)))
        return t.append_column("h", version_hash_column(t, ["user_id", "event_type"]))

    def split(keep_maybe: bool):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as _np
            import ray as _ray

            if t.num_rows == 0:
                return t if keep_maybe else t.select(cols)
            maybe = _np.asarray(_ray.get(bloom_ref).contains_many(fnv1a64(
                t["h"].combine_chunks() if isinstance(t["h"], pa.ChunkedArray) else t["h"]
            )))
            if keep_maybe:
                return t.filter(pa.array(maybe))
            return t.filter(pa.array(~maybe)).select(cols)

        return fn

    # the two filtered passes re-read the (pruned, columnar) second half
    # rather than materializing it — at scale a second scan is cheaper
    # than pinning the whole stream in the object store
    hashed = lambda: cm.read(sf_dir, "events", columns=cols).map_batches(  # noqa: E731
        second_half_hashed, batch_format="pyarrow"
    )
    definitely_new = hashed().map_batches(split(False), batch_format="pyarrow")
    maybe = hashed().map_batches(split(True), batch_format="pyarrow")

    if _stats is not None:
        _stats["second_half_rows"] = hashed().count()
        _stats["maybe_rows"] = maybe.count()

    survivors = bucketed_hash_join(
        maybe,
        first.map_batches(hash_first, batch_format="pyarrow"),
        on="h",
        how="left_anti",
    ).map_batches(lambda t: t.select(cols), batch_format="pyarrow")
    return definitely_new.union(survivors)


ORACLES["hash_antijoin_bloom"] = ORACLES["hash_antijoin_incremental"]


def distinct_users_hll(sf_dir: str, p: int = 12):
    """Approximate COUNT(DISTINCT user_id) via HyperLogLog: per-batch
    partial sketches (fixed 2^p registers) max-merged on the driver — the
    fixed-memory alternative to an exact distinct's all-to-all shuffle at
    10^10 keys. Rows-only driver check (approximate); the ±2% error bound
    vs the exact count is asserted in tests/test_sketch.py."""
    from ..core.hashing import fnv1a64
    from ..core.sketch import HyperLogLog

    ds = cm.read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        col = pc.cast(t["user_id"], pa.string())
        hll.add_many(fnv1a64(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col))
        return pa.table({"registers": pa.array([hll.registers.tobytes()], pa.binary())})

    merged = HyperLogLog(p)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b["registers"].to_pylist():
            other = HyperLogLog(p)
            other.registers = __import__("numpy").frombuffer(raw, dtype="uint8").copy()
            merged = merged.merge(other)
    return pd.DataFrame({"approx_distinct_users": [round(merged.estimate())]})


def hot_keys_countmin(sf_dir: str, threshold: int = 70):
    """Heavy hitters (keys with ≥ ``threshold`` events) via Count-Min
    sketch-prune + exact-verify — the skew monitor a 10^10-event replay
    feeds its salting decisions from, as an EXACT (driver-hashable) op:

    pass 1: per-batch CMS partials (fixed 4×4096 memory each), elementwise-
            summed on the driver — O(#batches) fixed-size rows, never keys;
    pass 2: per-batch local value_counts, keys pruned by the broadcast
            merged sketch's estimate ≥ threshold. CMS never UNDER-counts,
            so the candidate set is a superset of the true heavy hitters
            and the prune is loss-free; it is also tiny, because the
            threshold cuts the unbounded key space to the hot tail. The
            surviving partial counts take one routed sum, and the final
            exact filter drops CMS false positives.

    Output (user_id, n_events) is EXACT — the sketch only prunes, so the
    DuckDB oracle is a plain GROUP BY ... HAVING. One-sided-error and
    merge==bulk sketch properties stay in tests/test_sketch.py."""
    import numpy as np

    from ..core.hashing import fnv1a64
    from ..core.sketch import CountMin

    ds = cm.read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        cm_sk = CountMin()
        col = pc.cast(t["user_id"], pa.string())
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        cm_sk.add_many(fnv1a64(col))
        return pa.table({"table": pa.array([cm_sk.table.tobytes()], pa.binary())})

    merged = CountMin()
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b["table"].to_pylist():
            other = CountMin()
            other.table = np.frombuffer(raw, dtype=np.int64).reshape(other.table.shape).copy()
            merged = merged.merge(other)
    sk_ref = cm.broadcast(merged.table)

    class CandidateCounter:
        """Per-batch exact counts of sketch-candidate keys only."""

        def __init__(self):
            self.sk = CountMin()
            self.sk.table = __import__("ray").get(sk_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vc = df.groupby("user_id", as_index=False).agg(
                n_events=("user_id", "size"))
            keys = pa.array(vc["user_id"].astype(str), pa.string())
            est = self.sk.estimate_many(fnv1a64(keys))
            out = vc[est >= threshold]
            return out.astype({"user_id": "int64", "n_events": "int64"})

    cand = ds.map_batches(CandidateCounter, batch_format="pandas",
                          concurrency=(1, cm.pool_size()))
    summed = cm.routed_grouped_agg(cand, ["user_id"], {"n_events": "sum"})
    out = summed.map_batches(
        lambda df: df[df["n_events"] >= threshold], batch_format="pandas"
    ).to_pandas()
    return (out.astype({"user_id": "int64", "n_events": "int64"})
            .sort_values("user_id").reset_index(drop=True))


ORACLES["hot_keys_countmin"] = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id HAVING COUNT(*) >= 70
"""


def price_quantiles_kll(sf_dir: str, k: int = 200):
    """Approximate quantiles of a CONTINUOUS column
    (``lineitem.l_extendedprice``) via the mergeable KLL sketch — the
    10^10-row path where :func:`..tokens.ntok_quantiles`'s exact
    bounded-integer histogram cannot apply and an exact answer is a
    full sort. Per-batch partial sketches (fixed O(k·log n) floats
    each) ride to the driver as bytes — O(#blocks) sketch rows, never
    the column — and merge associatively like every other combiner in
    the repo. Approximate by construction → module-level face; the
    ±rank-ε bound vs DuckDB's exact quantiles is pinned in
    tests/test_kll.py."""
    import numpy as np

    from ..core.sketch import KLL

    ds = cm.read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        s = KLL(k)
        s.add_many(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    merged = KLL(k)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b["sketch"].to_pylist():
            merged = merged.merge(KLL.from_bytes(raw))
    return pd.DataFrame({
        "p50": [merged.quantile(0.5)],
        "p90": [merged.quantile(0.9)],
        "p99": [merged.quantile(0.99)],
        "n": [int(merged.n)],
    })
