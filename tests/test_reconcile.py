"""Schema-evolution reconciler tests — FIXTURES.md §F3 cases E1–E4."""

from __future__ import annotations

import pyarrow as pa
import pytest

from gamechanger_data_ray.core.reconcile import (
    SchemaEvolutionError,
    conform,
    unify_all,
    unify_schemas,
)

BASE = pa.schema(
    [("doc_id", pa.string()), ("n_tok", pa.int32()), ("source", pa.string())]
)


def test_e1_column_add():
    evolved = pa.schema(
        [("doc_id", pa.string()), ("n_tok", pa.int32()), ("source", pa.string()), ("lang", pa.string())]
    )
    uni = unify_schemas(BASE, evolved)
    assert uni.field("lang").type == pa.string()
    old = pa.table({"doc_id": ["a"], "n_tok": pa.array([1], pa.int32()), "source": ["s"]})
    out = conform(old, uni)
    assert out["lang"][0].as_py() is None  # earlier rows read as null


def test_e2_int_widen():
    evolved = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()), ("source", pa.string())])
    uni = unify_schemas(BASE, evolved)
    assert uni.field("n_tok").type == pa.int64()
    old = pa.table({"doc_id": ["a"], "n_tok": pa.array([7], pa.int32()), "source": ["s"]})
    assert conform(old, uni)["n_tok"][0].as_py() == 7  # values preserved


def test_e2_widen_is_symmetric():
    evolved = pa.schema([("n_tok", pa.int64())])
    assert unify_schemas(pa.schema([("n_tok", pa.int32())]), evolved).field("n_tok").type == pa.int64()
    assert unify_schemas(evolved, pa.schema([("n_tok", pa.int32())])).field("n_tok").type == pa.int64()


def test_e3_enum_growth_is_noop():
    # source is a plain string column; new enum values need no schema change,
    # and a dictionary-encoded variant unifies to string.
    dict_schema = pa.schema([("source", pa.dictionary(pa.int32(), pa.string()))])
    uni = unify_schemas(pa.schema([("source", pa.string())]), dict_schema)
    assert uni.field("source").type == pa.string()


def test_e4_narrowing_conflict_raises():
    bad = pa.schema([("doc_id", pa.string()), ("n_tok", pa.string()), ("source", pa.string())])
    with pytest.raises(SchemaEvolutionError):
        unify_schemas(BASE, bad)


def test_conform_rejects_uncastable():
    target = pa.schema([("n_tok", pa.int32())])
    t = pa.table({"n_tok": ["not-a-number"]})
    with pytest.raises(SchemaEvolutionError):
        conform(t, target)


def test_list_value_widen():
    a = pa.schema([("tokens", pa.list_(pa.int32()))])
    b = pa.schema([("tokens", pa.list_(pa.int64()))])
    assert unify_all([a, b]).field("tokens").type == pa.list_(pa.int64())


def test_int_float_promotes_to_float():
    a = pa.schema([("x", pa.int32())])
    b = pa.schema([("x", pa.float64())])
    assert unify_schemas(a, b).field("x").type == pa.float64()
