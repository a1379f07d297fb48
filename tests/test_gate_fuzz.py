"""Seeded randomized GATE lifecycle fuzz: a deterministic walk over the
chained ingest gate (quality → decontam → exact) interleaved with the
operational surface around it — fenced retries, crashed-attempt tmp
residue, operator readmits, deletes, within-epoch twins and quarantine
retention — checking after EVERY gated epoch that

- the committed table equals a serial Python fold of exactly the events
  the screen chain should have admitted (LWW by (lsn, seq), D removes),
- the quarantine audit trail carries exactly the suppressed rows with
  the exact reason strings each screen documents (quality rule text,
  ``contaminated:ngram=L:hits=N``, exact-twin doc_id + jaccard 1.0),
- screening is against the state committed as of the PREVIOUS epoch
  (within-epoch twins both pass; deletes retract the exact index;
  readmitted docs are screened against from the next epoch on), and
- retention (policy + expire) drops exactly the expired audit dirs and
  an expired epoch readmits as a clean no-op.

The fixed-case suites (test_ingest_gate / test_quality_gate /
test_decontam_gate) pin each behavior in isolation; this test explores
the ORDERINGS — e.g. readmit-then-dup-of-readmitted, delete-then-copy,
retry-after-crash-residue — where the fences and the index currency
actually interact. Failures reproduce exactly from the seed."""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from gamechanger_data_ray.engine.cdc import table_to_arrow
from gamechanger_data_ray.engine.ingest_gate import (
    JACCARD_COLUMN,
    MATCH_COLUMN,
    QUARANTINE_DIR,
    apply_with_neardup_gate,
    expire_quarantine,
    list_quarantine_epochs,
    read_quarantine,
    readmit,
    set_quarantine_policy,
)

NGRAM = 4
MIN_TOK = 8
MAX_TOP_FRAC = 0.5
CHAIN = ["quality", "decontam", "exact"]
EPOCHS = 6
EVENTS_PER_EPOCH = 18

_SEEDS = [3, 11] + [
    int(s) for s in os.environ.get("GRAFT_FUZZ_SEEDS", "").split(",") if s
]

BENCH = [[9001, 9002, 9003, 9004, 9005], [8101, 8102, 8103, 8104]]
_BENCH_WINDOWS = {
    tuple(s[i:i + NGRAM]) for s in BENCH for i in range(len(s) - NGRAM + 1)
}


def _events_table(rows):
    op, lsn, seq, doc, toks = zip(*rows)
    return pa.table({
        "op": pa.array(op, pa.string()),
        "lsn": pa.array(lsn, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "doc_id": pa.array(doc, pa.string()),
        "tokens": pa.array(
            [list(t) if t is not None else None for t in toks],
            pa.list_(pa.int32())),
    })


def _clean_tokens(rng: random.Random, n: int | None = None) -> list[int]:
    """Clean w.r.t. every screen: long enough, no dominant token, no
    bench window (vocab < 8000)."""
    n = n if n is not None else rng.randint(MIN_TOK, MIN_TOK + 12)
    return [rng.randint(0, 7000) for _ in range(n)]


# --- the serial oracle: one screen chain applied to one event ----------

def _quality_reason(toks: list[int]) -> str | None:
    n = len(toks)
    if n < MIN_TOK:
        return f"quality:n_tok={n}<{MIN_TOK}"
    counts: dict[int, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    top = max(counts.values()) / max(n, 1)
    if top > MAX_TOP_FRAC:
        return f"quality:top_token_frac={top:.3f}>{MAX_TOP_FRAC}"
    return None


def _decontam_reason(toks: list[int]) -> str | None:
    hits = {tuple(toks[i:i + NGRAM]) for i in range(len(toks) - NGRAM + 1)
            } & _BENCH_WINDOWS
    if hits:
        return f"contaminated:ngram={NGRAM}:hits={len(hits)}"
    return None


def _exact_twin(doc: str, toks: list[int], committed: dict) -> str | None:
    key = tuple(toks)
    twins = sorted(d for d, t in committed.items() if t == key and d != doc)
    return twins[0] if twins else None


def _screen_oracle(doc, toks, op, committed):
    """(reason, jaccard) per the documented chain order, or (None, None)
    for an admitted event."""
    if op == "D" or toks is None:
        return None, None
    r = _quality_reason(toks)
    if r:
        return r, None
    r = _decontam_reason(toks)
    if r:
        return r, None
    twin = _exact_twin(doc, toks, committed)
    if twin is not None:
        return twin, 1.0
    return None, None


@pytest.mark.parametrize("seed", _SEEDS)
def test_gate_lifecycle_fuzz(tmp_path, seed):
    rng = random.Random(seed)
    tb, vd = str(tmp_path / "tb"), str(tmp_path / "idx")
    bench_path = str(tmp_path / "bench.parquet")
    pq.write_table(
        pa.table({"tokens": pa.array(BENCH, pa.list_(pa.int32()))}),
        bench_path)

    committed: dict[str, tuple] = {}   # doc_id -> token tuple (live docs)
    quarantined: dict[int, dict] = {}  # epoch -> {doc: (reason, jac, toks)}
    cur_epoch = 0
    trace: list[str] = []

    def gate(events, epoch):
        return apply_with_neardup_gate(
            ray.data.from_arrow(events), tb, vd, epoch, events.schema,
            num_partitions=4, mode=CHAIN, min_tok=MIN_TOK,
            max_top_frac=MAX_TOP_FRAC, bench_path=bench_path, ngram=NGRAM)

    def check_state():
        got = table_to_arrow(tb)
        mine = dict(zip(got["doc_id"].to_pylist(),
                        (tuple(t) for t in got["tokens"].to_pylist())))
        assert mine == committed, f"seed={seed} table diverged after {trace}"
        assert list_quarantine_epochs(tb) == sorted(
            e for e, q in quarantined.items() if q), (
            f"seed={seed} quarantine dirs diverged after {trace}")
        for e, want in quarantined.items():
            q = read_quarantine(tb, e)
            rows = {d: (m, j) for d, m, j in zip(
                q["doc_id"].to_pylist(), q[MATCH_COLUMN].to_pylist(),
                q[JACCARD_COLUMN].to_pylist())}
            assert rows == {d: (m, j) for d, (m, j, _) in want.items()}, (
                f"seed={seed} quarantine epoch {e} diverged after {trace}")

    for step in range(EPOCHS):
        cur_epoch += 1
        epoch = cur_epoch
        rows, seq = [], 0
        committed_before = dict(committed)
        live = sorted(committed_before)
        for _ in range(EVENTS_PER_EPOCH):
            kind = rng.choice(
                ["novel", "novel", "novel", "dup", "degenerate", "repetitive",
                 "contaminated", "self_update", "delete", "twin_pair"])
            if kind == "novel":
                rows.append(("I", epoch, seq,
                             f"novel-{epoch}-{seq}", _clean_tokens(rng)))
            elif kind == "dup" and live:
                src = rng.choice(live)
                rows.append(("I", epoch, seq, f"dup-{epoch}-{seq}",
                             list(committed_before[src])))
            elif kind == "degenerate":
                rows.append(("I", epoch, seq, f"deg-{epoch}-{seq}",
                             _clean_tokens(rng, n=rng.randint(1, MIN_TOK - 1))))
            elif kind == "repetitive":
                n = MIN_TOK + 4
                toks = [7777] * (n - 2) + _clean_tokens(rng, n=2)
                rows.append(("I", epoch, seq, f"rep-{epoch}-{seq}", toks))
            elif kind == "contaminated":
                w = list(rng.choice(sorted(_BENCH_WINDOWS)))
                toks = _clean_tokens(rng, n=MIN_TOK) + w
                rows.append(("I", epoch, seq, f"cont-{epoch}-{seq}", toks))
            elif kind == "self_update" and live:
                doc = rng.choice(live)
                toks = (list(committed_before[doc]) if rng.random() < 0.5
                        else _clean_tokens(rng))
                rows.append(("U", epoch, seq, doc, toks))
            elif kind == "delete" and live:
                rows.append(("D", epoch, seq, rng.choice(live), None))
            elif kind == "twin_pair":
                toks = _clean_tokens(rng)
                rows.append(("I", epoch, seq, f"twa-{epoch}-{seq}", toks))
                seq += 1
                rows.append(("I", epoch, seq, f"twb-{epoch}-{seq}",
                             list(toks)))
            else:  # dup/self_update/delete drawn on an empty table
                rows.append(("I", epoch, seq,
                             f"novel-{epoch}-{seq}", _clean_tokens(rng)))
            seq += 1
        trace.append(f"epoch{epoch}")

        if rng.random() < 0.3:  # crashed-attempt residue before the run
            orphan = os.path.join(
                tb, QUARANTINE_DIR, f"epoch-{epoch:06d}.tmp-crashed")
            os.makedirs(orphan, exist_ok=True)
            with open(os.path.join(orphan, "junk.parquet"), "wb") as f:
                f.write(b"residue")
            trace.append("crash-residue")

        events = _events_table(rows)
        res = gate(events, epoch)

        # fold the oracle: screen against committed_before, apply the
        # admitted events serially (one event per doc per epoch except
        # twin pairs, which never share a doc_id)
        sup: dict[str, tuple] = {}
        for op, _lsn, _seq, doc, toks in rows:
            reason, jac = _screen_oracle(doc, toks, op, committed_before)
            if reason is not None:
                sup[doc] = (reason, jac, toks)
            elif op == "D":
                committed.pop(doc, None)
            else:
                committed[doc] = tuple(toks)
        if sup:
            quarantined[epoch] = sup
        assert res["suppressed"] == len(sup), (
            f"seed={seed} suppressed count diverged after {trace}")
        check_state()

        if rng.random() < 0.3:  # fenced retry: same epoch, same events
            trace.append("retry")
            again = gate(events, epoch)
            assert again["suppressed"] == len(sup)
            check_state()

        recoverable = [(e, d) for e, q in quarantined.items()
                       for d, (_m, _j, t) in q.items() if t is not None]
        if recoverable and rng.random() < 0.4:
            e, d = rng.choice(sorted(recoverable))
            trace.append(f"readmit:{e}:{d}")
            out = readmit(tb, e, [d], view_dir=vd, mode=CHAIN,
                          num_partitions=4)
            assert out["readmitted"] == 1
            cur_epoch += 1
            committed[d] = tuple(quarantined[e][d][2])
            check_state()

        if rng.random() < 0.3 and len(
                [e for e, q in quarantined.items() if q]) > 2:
            keep = rng.randint(1, 2)
            trace.append(f"expire:keep={keep}")
            set_quarantine_policy(tb, keep)
            out = expire_quarantine(tb)
            live_q = sorted(e for e, q in quarantined.items() if q)
            assert out["removed"] == live_q[:-keep]
            for e in out["removed"]:
                del quarantined[e]
                # expired epochs readmit as a clean no-op
                assert readmit(tb, e) == {"epoch": None, "readmitted": 0}
            check_state()
