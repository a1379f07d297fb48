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
