"""Property-based tests (hypothesis) for the column-coalesce kernel —
the algebraic guarantees that make partial-update merge a valid
pre-shuffle combiner:

1. oracle equivalence: the kernel matches the serial per-column fold on
   any event sequence (partial cells, deletes, duplicate deliveries);
2. associativity: reducing arbitrary splits then reducing the partials
   equals reducing the whole (the combiner property);
3. idempotence: the reduce is a no-op on its own output;
4. weight conservation: EVENTS_REP/TOMBS_REP sum exactly to raw counts
   through any reduce chain.

Complements the randomized-numpy tests in test_coalesce.py with
hypothesis shrinking (a failing case minimizes to the smallest event
sequence that breaks the algebra).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from gamechanger_data_ray.core.coalesce import (
    attach_orders,
    coalesce_reduce,
    strip_transients,
)
from gamechanger_data_ray.core.merge import EVENTS_REP, TOMBS_REP

PAYLOAD = ("a", "b")

# (key_idx, lsn, seq, op_idx, cell_mask): payload cells are pure functions
# of the event identity, so duplicate deliveries repeat content verbatim
# (the delivery contract); cell_mask picks which columns the event writes
EVENT = st.tuples(
    st.integers(0, 3),       # key
    st.integers(1, 4),       # lsn
    st.integers(0, 9),       # seq
    st.integers(0, 4),       # op: 0 → D, else U
    st.integers(0, 3),       # cell mask bits for (a, b)
)


def _to_table(events) -> pa.Table:
    rows = []
    for k, lsn, seq, op, mask in events:
        is_del = op == 0
        rows.append({
            "op": "D" if is_del else "U",
            "lsn": lsn,
            "seq": seq,
            "doc_id": f"k{k}",
            "a": f"a{k}.{lsn}.{seq}" if (not is_del and mask & 1) else None,
            "b": f"b{k}.{lsn}.{seq}" if (not is_del and mask & 2) else None,
        })
    return pa.table({
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
        "seq": pa.array([r["seq"] for r in rows], pa.int64()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "a": pa.array([r["a"] for r in rows], pa.string()),
        "b": pa.array([r["b"] for r in rows], pa.string()),
    })


def _fold(events) -> dict:
    """Serial oracle: apply in (lsn, seq) order; same (lsn, seq) = the
    same delivery (content identical by construction), so dedup first."""
    state: dict[str, dict] = {}
    seen = set()
    for k, lsn, seq, op, mask in sorted(events, key=lambda e: (e[1], e[2])):
        if (k, lsn, seq) in seen:
            continue
        seen.add((k, lsn, seq))
        key = f"k{k}"
        if op == 0:
            state.pop(key, None)
        else:
            cur = state.setdefault(key, {})
            if mask & 1:
                cur["a"] = f"a{k}.{lsn}.{seq}"
            if mask & 2:
                cur["b"] = f"b{k}.{lsn}.{seq}"
    return state


def _final(t: pa.Table) -> dict:
    t = strip_transients(t)
    t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
    return {
        r["doc_id"]: {c: r[c] for c in PAYLOAD if r[c] is not None}
        for r in t.to_pylist()
    }


def _dedup_deliveries(events):
    """(key, lsn, seq) identifies a delivery; repeats are verbatim dups
    (allowed), but two DIFFERENT events at one (key, lsn, seq) violate
    the total-order contract — normalize to the first."""
    seen, out = {}, []
    for e in events:
        ident = (e[0], e[1], e[2])
        out.append(seen.setdefault(ident, e))
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(EVENT, min_size=1, max_size=30))
def test_kernel_equals_serial_fold(events):
    events = _dedup_deliveries(events)
    got = _final(coalesce_reduce(attach_orders(_to_table(events))))
    assert got == _fold(events)


@settings(max_examples=60, deadline=None)
@given(st.lists(EVENT, min_size=2, max_size=30), st.data())
def test_split_reduce_recombine_is_associative(events, data):
    events = _dedup_deliveries(events)
    cut = data.draw(st.integers(1, len(events) - 1))
    whole = coalesce_reduce(attach_orders(_to_table(events)))
    left = coalesce_reduce(attach_orders(_to_table(events[:cut])))
    right = coalesce_reduce(attach_orders(_to_table(events[cut:])))
    recombined = coalesce_reduce(
        pa.concat_tables([left, right], promote_options="default"))
    assert _final(recombined) == _final(whole)
    # idempotence + weight conservation through the chain
    assert _final(coalesce_reduce(recombined)) == _final(whole)
    assert (pc.sum(recombined[EVENTS_REP]).as_py()
            == pc.sum(whole[EVENTS_REP]).as_py() == len(events))
    n_tombs = sum(1 for e in events if e[3] == 0)
    assert pc.sum(recombined[TOMBS_REP]).as_py() == n_tombs
