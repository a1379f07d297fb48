"""Date/timestamp parsing — parity with the reference's permissive parsers
(``common/utils/parsers.py:6-41``: pandas-permissive ``parse_timestamp`` and
strict ``parse_formatted_timestamp``) plus the canonical checkpoint format
(``common/utils/s3.py:34``: ``%Y-%m-%dT%H:%M:%S``), vectorized per batch.
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pyarrow as pa

CANONICAL_FORMAT = "%Y-%m-%dT%H:%M:%S"


def parse_timestamp(value, default=None):
    """Permissive single-value parse (driver-side): anything pandas can
    coerce; ``default`` on failure."""
    try:
        ts = pd.to_datetime(value)
        if pd.isna(ts):
            return default
        return ts.to_pydatetime()
    except (ValueError, TypeError):
        return default


def parse_formatted_timestamp(value: str, fmt: str = CANONICAL_FORMAT, default=None):
    try:
        return datetime.strptime(value, fmt)
    except (ValueError, TypeError):
        return default


def format_timestamp(dt: datetime) -> str:
    return dt.strftime(CANONICAL_FORMAT)


def parse_timestamp_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized permissive parse of a string column → timestamp[us]
    (unparseable → null), the batch kernel for metadata repair."""
    s = pd.to_datetime(pd.Series(arr.to_pylist()), errors="coerce", format="mixed")
    return pa.Array.from_pandas(s.astype("datetime64[us]"))
