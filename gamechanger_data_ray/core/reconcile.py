"""Arrow-schema reconciler — schema evolution across changelog epochs.

Models the reference's in-band schema normalization: old-vs-new metadata
format fallbacks (``common/document_parser/parsers/policy_analytics/parse.py:132-139``),
JSON-string-vs-JSON repair (``dataPipelines/gc_ingest/tools/load/utils.py:112-130``),
and rename/delete projection (``parse.py:154-205``) — generalized to an
explicit widen-only Arrow schema unifier applied BEFORE the merge groupby,
so heterogeneous epochs concat cleanly.

Policy (FIXTURES.md §F3):
- column add   → missing column materialized as nulls (E1)
- int widen    → int8 < int16 < int32 < int64; float32 < float64;
  signed-over-unsigned of same rank widens to next signed (E2)
- enum growth  → plain string columns, nothing to do (E3)
- narrowing / kind conflict (e.g. n_tok arriving as string) → raises
  SchemaEvolutionError; never corrupts the table (E4)
"""

from __future__ import annotations

import pyarrow as pa


class SchemaEvolutionError(TypeError):
    """Incompatible (narrowing / kind-conflicting) schema change."""


_INT_RANK = {
    pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64,
    pa.uint8(): 9, pa.uint16(): 17, pa.uint32(): 33, pa.uint64(): 65,
}
_FLOAT_RANK = {pa.float16(): 16, pa.float32(): 32, pa.float64(): 64}


def _unify_types(a: pa.DataType, b: pa.DataType, field: str) -> pa.DataType:
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    if pa.types.is_integer(a) and pa.types.is_integer(b):
        ra, rb = _INT_RANK[a], _INT_RANK[b]
        wide = max(ra, rb)
        # mixing signed/unsigned: promote to signed of strictly larger width
        if (pa.types.is_signed_integer(a) != pa.types.is_signed_integer(b)):
            wide = {8: 16, 9: 16, 16: 32, 17: 32, 32: 64, 33: 64}.get(wide)
            if wide is None:
                raise SchemaEvolutionError(
                    f"cannot widen mixed-sign 64-bit integers for column {field!r}: {a} vs {b}")
        return {8: pa.int8(), 16: pa.int16(), 32: pa.int32(), 64: pa.int64(),
                9: pa.uint8(), 17: pa.uint16(), 33: pa.uint32(), 65: pa.uint64()}[wide]
    if (pa.types.is_floating(a) and pa.types.is_floating(b)):
        return a if _FLOAT_RANK[a] >= _FLOAT_RANK[b] else b
    if (pa.types.is_integer(a) and pa.types.is_floating(b)):
        return b
    if (pa.types.is_floating(a) and pa.types.is_integer(b)):
        return a
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(_unify_types(a.value_type, b.value_type, field + ".item"))
    if (pa.types.is_large_string(a) and pa.types.is_string(b)) or (
        pa.types.is_string(a) and pa.types.is_large_string(b)
    ):
        return pa.large_string()
    if pa.types.is_dictionary(a):
        return _unify_types(a.value_type, b, field)
    if pa.types.is_dictionary(b):
        return _unify_types(a, b.value_type, field)
    raise SchemaEvolutionError(
        f"incompatible schema evolution for column {field!r}: {a} vs {b}"
    )


def unify_schemas(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Widen-only union of two schemas.

    Column order: ``current``'s order, then new ``incoming`` columns in their
    own order. Raises :class:`SchemaEvolutionError` on conflict.
    """
    fields: list[pa.Field] = []
    seen: dict[str, int] = {}
    for f in current:
        fields.append(f)
        seen[f.name] = len(fields) - 1
    for f in incoming:
        if f.name in seen:
            i = seen[f.name]
            unified = _unify_types(fields[i].type, f.type, f.name)
            fields[i] = pa.field(f.name, unified, nullable=True)
        else:
            fields.append(pa.field(f.name, f.type, nullable=True))
    return pa.schema(fields)


def conform(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``target``: add missing columns as nulls, widen
    numeric columns, reorder. Safe (widen-only) by construction when
    ``target`` came from :func:`unify_schemas`."""
    n = table.num_rows
    cols = []
    for f in target:
        i = table.schema.get_field_index(f.name)
        if i == -1:
            cols.append(pa.nulls(n, type=f.type))
        else:
            col = table.column(i)
            if not col.type.equals(f.type):
                try:
                    col = col.cast(f.type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                    raise SchemaEvolutionError(
                        f"cannot conform column {f.name!r} from {col.type} to {f.type}: {e}"
                    ) from e
            cols.append(col)
    return pa.Table.from_arrays(cols, schema=target)


def unify_all(schemas: list[pa.Schema]) -> pa.Schema:
    """Fold :func:`unify_schemas` over a list of schemas."""
    if not schemas:
        raise ValueError("no schemas to unify")
    out = schemas[0]
    for s in schemas[1:]:
        out = unify_schemas(out, s)
    return out


def _validate_renames(names: list[str], renames: dict[str, str]) -> None:
    """A rename may not land on a name the batch ALSO carries unrenamed
    (silent column merge), nor may two old names map to one new name."""
    targets = list(renames.values())
    if len(set(targets)) != len(targets):
        raise SchemaEvolutionError(f"rename targets collide: {renames}")
    for old, new in renames.items():
        if old in names and new in names:
            raise SchemaEvolutionError(
                f"rename {old!r}->{new!r} collides with existing column {new!r}")


def rename_schema(schema: pa.Schema, renames: dict[str, str] | None) -> pa.Schema:
    """Schema with the rename map applied (old names absent pass through —
    the map describes a TRANSITION, so epochs from before and after the
    producer's rename both conform). The source-boundary half of the
    reference's rename/delete projection (``parse.py:154-205``)."""
    if not renames:
        return schema
    _validate_renames(schema.names, renames)
    return pa.schema(
        [f.with_name(renames.get(f.name, f.name)) for f in schema],
        metadata=schema.metadata,
    )


def rename_table(table: pa.Table, renames: dict[str, str] | None) -> pa.Table:
    """Batch with the rename map applied (see :func:`rename_schema`)."""
    if not renames:
        return table
    _validate_renames(table.schema.names, renames)
    return table.rename_columns(
        [renames.get(n, n) for n in table.schema.names]
    )
