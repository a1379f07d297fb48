"""Every query with a SQL oracle must match DuckDB at sf0.001 — the same
check the driver runs at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __ray_entry__ as entrymod
from util_oracle import compare, to_df

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, sf_dir):
    compare(QUERIES[name], ORACLES[name], sf_dir)


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


def test_driver_contract_consistency():
    """Every oracle references an existing query; no name collisions
    across the query modules (a duplicate would silently shadow)."""
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)
    from gamechanger_data_ray.pipelines import (
        analysis_queries,
        cdc_queries,
        incremental,
        relational,
        tokens,
    )

    mods = [analysis_queries, cdc_queries, incremental, relational, tokens]
    seen: dict[str, str] = {}
    for m in mods:
        for name in QUERIES:
            if getattr(m, name, None) is not None:
                assert name not in seen or seen[name] == m.__name__, (
                    f"query {name!r} defined in both {seen[name]} and {m.__name__}"
                )
                seen.setdefault(name, m.__name__)
    assert set(seen) == set(QUERIES)
