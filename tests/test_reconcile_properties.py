"""Property-based tests (hypothesis) for the schema reconciler: the
widen-only unifier must behave like a join-semilattice over schemas —
commutative up to column order, associative, idempotent — and ``conform``
must be value-preserving and idempotent. These are the guarantees that
make "reconcile each epoch independently, in any order, then merge" sound
(engine/cdc.py unifies per-file footer schemas before the shuffle)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from gamechanger_data_ray.core.reconcile import conform, unify_all, unify_schemas

# a pool of evolvable column types (all mutually widenable)
NUMERIC = [pa.int8(), pa.int16(), pa.int32(), pa.int64(), pa.float32(), pa.float64()]
COLUMN_NAMES = ["a", "b", "c", "d"]


@st.composite
def schemas(draw):
    names = draw(st.lists(st.sampled_from(COLUMN_NAMES), min_size=1, max_size=4, unique=True))
    return pa.schema([pa.field(n, draw(st.sampled_from(NUMERIC))) for n in names])


def _canon(s: pa.Schema) -> dict:
    return {f.name: f.type for f in s}


@given(schemas(), schemas())
@settings(max_examples=200, deadline=None)
def test_unify_commutes_up_to_column_order(a, b):
    assert _canon(unify_schemas(a, b)) == _canon(unify_schemas(b, a))


@given(schemas(), schemas(), schemas())
@settings(max_examples=200, deadline=None)
def test_unify_is_associative(a, b, c):
    lhs = unify_schemas(unify_schemas(a, b), c)
    rhs = unify_schemas(a, unify_schemas(b, c))
    assert _canon(lhs) == _canon(rhs)
    assert _canon(lhs) == _canon(unify_all([a, b, c]))


@given(schemas())
@settings(max_examples=100, deadline=None)
def test_unify_is_idempotent_and_absorbing(a):
    assert _canon(unify_schemas(a, a)) == _canon(a)
    # unified schema absorbs both inputs: unify(u, a) == u
    b = pa.schema([pa.field("a", pa.int64()), pa.field("z", pa.float32())])
    u = unify_schemas(a, b)
    assert _canon(unify_schemas(u, a)) == _canon(u)
    assert _canon(unify_schemas(u, b)) == _canon(u)


@given(schemas(), schemas(), st.lists(st.integers(-100, 100), min_size=0, max_size=8))
@settings(max_examples=200, deadline=None)
def test_conform_preserves_values_and_is_idempotent(a, b, vals):
    u = unify_schemas(a, b)
    t = pa.table({f.name: pa.array(vals, f.type) for f in a})
    c = conform(t, u)
    assert c.schema.equals(u)
    assert c.num_rows == t.num_rows
    # original columns keep their values (widened, never mangled)
    for f in a:
        assert c[f.name].cast(pa.float64()).to_pylist() == t[f.name].cast(pa.float64()).to_pylist()
    # added columns are all-null
    for f in u:
        if a.get_field_index(f.name) == -1:
            assert c[f.name].null_count == c.num_rows
    assert conform(c, u).equals(c)
