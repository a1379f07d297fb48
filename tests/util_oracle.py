"""Mirror of the driver's correctness check: run a query callable and its
oracle SQL on the same sf_dir, compare row count, column names, and
order-insensitive values."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def to_df(result) -> pd.DataFrame:
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif isinstance(df[c].dtype, pd.DatetimeTZDtype) or pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(query_fn, sql: str, sf_dir: str) -> None:
    mine = normalize(to_df(query_fn(sf_dir)))
    con = duck_con(sf_dir)
    oracle = normalize(con.sql(sql).df())
    assert list(mine.columns) == list(oracle.columns), (
        f"columns differ: {list(mine.columns)} vs {list(oracle.columns)}"
    )
    assert len(mine) == len(oracle), f"row count {len(mine)} vs {len(oracle)}"
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=False, rtol=1e-5)
