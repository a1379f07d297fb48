"""Every query with a SQL oracle must match DuckDB at sf0.001 — the same
check the driver runs at sf0.01 (CORRECTNESS_r{N}.json). The full module
oracle set is checked, including operators not currently registered with
the 50-slot driver contract (q6, topk_part_types, sliding window, the
split text/multimodal variants, …)."""

from __future__ import annotations

import pytest

import __ray_entry__ as entrymod
from util_oracle import compare, to_df

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
ALL_ORACLES = entrymod.all_module_oracles()
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def _callable_for(name):
    """Resolve an oracle key to its query callable: the registered
    callable when the name is in the driver contract, else the module
    function of the same name."""
    if name in QUERIES:
        return QUERIES[name]
    from gamechanger_data_ray.pipelines import (
        analysis_queries,
        cdc_queries,
        extraction_queries,
        incremental,
        relational,
        search,
        tokens,
    )

    for m in (relational, cdc_queries, incremental, analysis_queries, tokens,
              extraction_queries, search):
        fn = getattr(m, name, None)
        if fn is not None:
            return fn
    raise AssertionError(f"oracle {name!r} has no query function")


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_query_matches_oracle(name, sf_dir):
    compare(_callable_for(name), ALL_ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, sf_dir):
    df = to_df(QUERIES[name](sf_dir))
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_entry_smoke():
    ds = entrymod.entry()
    n = ds.count()
    assert n > 0
    assert {"doc_id", "tokens", "n_tok", "source"} <= set(ds.schema().names)


def test_exactly_50_registered():
    assert len(QUERIES) == 50


def test_driver_contract_consistency():
    """Every registered oracle references a registered query; every
    registered query name resolves to a function in exactly one pipeline
    module (a duplicate would silently shadow). Registered callables may
    be a ``<name>_q`` driver-checkable projection of the module function
    with the same base name."""
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)
    from gamechanger_data_ray.pipelines import (
        analysis_queries,
        cdc_queries,
        extraction_queries,
        incremental,
        relational,
        search,
        tokens,
    )

    mods = [analysis_queries, cdc_queries, incremental, relational, tokens,
            extraction_queries, search]
    seen: dict[str, str] = {}
    for m in mods:
        for name in QUERIES:
            if getattr(m, name, None) is not None:
                assert name not in seen or seen[name] == m.__name__, (
                    f"query {name!r} defined in both {seen[name]} and {m.__name__}"
                )
                seen.setdefault(name, m.__name__)
    assert set(seen) == set(QUERIES)
