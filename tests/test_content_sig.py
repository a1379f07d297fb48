"""Properties of the manifest content signature
(core/hashing.py::state_content_sig) — the logical-identity key derived
state uses for change detection. Wrong here = silently stale training
shards, so the invariants are pinned directly:

- permutation invariance (an MOR resolve and a clustered rewrite order
  rows differently);
- sensitivity: any row added/removed/moved to a new (lsn, seq) changes
  the sig;
- skinny/full equivalence: the sig from the delta path's merge index
  equals the sig from the rewrite path's full table."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from gamechanger_data_ray.core.hashing import state_content_sig


def _table(rows):
    d, l, s = zip(*rows) if rows else ((), (), ())
    return pa.table({
        "doc_id": pa.array(list(d), pa.string()),
        "lsn": pa.array(list(l), pa.int64()),
        "seq": pa.array(list(s), pa.int64()),
    })


rows_st = st.lists(
    st.tuples(st.text(alphabet="abc|:0123456789", min_size=1, max_size=8),
              st.integers(0, 50), st.integers(0, 50)),
    min_size=0, max_size=40, unique=True,
)


@settings(max_examples=60, deadline=None)
@given(rows_st, st.randoms(use_true_random=False))
def test_sig_is_permutation_invariant(rows, rnd):
    a = state_content_sig(_table(rows))
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    assert state_content_sig(_table(shuffled)) == a


@settings(max_examples=60, deadline=None)
@given(rows_st)
def test_sig_moves_on_any_single_row_change(rows):
    base = state_content_sig(_table(rows))
    # removal
    if rows:
        assert state_content_sig(_table(rows[1:])) != base
        # a row's change clock advancing (the CDC upsert shape)
        d, l, s = rows[0]
        bumped = [(d, l + 1, 0)] + rows[1:]
        if bumped[0] not in rows:
            assert state_content_sig(_table(bumped)) != base
    # addition
    extra = rows + [("zz-new", 99, 99)]
    assert state_content_sig(_table(extra)) != base


def test_sig_extra_columns_ignored_and_empty_stable():
    rows = [("a", 1, 2), ("b", 3, 4)]
    skinny = _table(rows)
    full = skinny.append_column("tokens", pa.array([[1, 2], [3]],
                                                   pa.list_(pa.int32())))
    assert state_content_sig(full) == state_content_sig(skinny)
    assert state_content_sig(_table([])) == "0:0"
