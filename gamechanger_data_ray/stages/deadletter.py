"""Dead-letter handling — poison records must not kill the pipeline.

Reference parity: per-doc try/except skip-and-log
(``common/document_parser/process.py:121-131``,
``parsers/policy_analytics/parse.py:86-88``: OCRError / UnparseableDocument
→ log & continue) upgraded to an explicit dead-letter channel: failed rows
are captured with the error message instead of silently dropped, and the
stage emits a ``_dlq`` marker column so the caller can split good rows
from dead letters with one filter."""

from __future__ import annotations

import traceback
from typing import Callable

import pandas as pd

DLQ_COLUMN = "_dlq_error"


def with_dead_letter(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    fallback_batch_size: int = 1,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Wrap a batch transform: if the whole batch fails, retry rows in
    ``fallback_batch_size`` slices so only the poison rows go to the DLQ
    (the vectorized fast path stays the common case).

    Output = transformed good rows (DLQ column null) + original poison rows
    with ``_dlq_error`` set. Split with ``df[df._dlq_error.isna()]``."""

    def wrapped(batch: pd.DataFrame) -> pd.DataFrame:
        try:
            out = fn(batch.copy())
            out[DLQ_COLUMN] = None
            return out
        except Exception:
            pass
        parts = []
        for i in range(0, len(batch), fallback_batch_size):
            piece = batch.iloc[i : i + fallback_batch_size]
            try:
                out = fn(piece.copy())
                out[DLQ_COLUMN] = None
                parts.append(out)
            except Exception as e:  # noqa: BLE001 — the whole point
                dead = piece.copy()
                dead[DLQ_COLUMN] = f"{type(e).__name__}: {e}"
                parts.append(dead)
        return pd.concat(parts, ignore_index=True)

    return wrapped


def split_dead_letters(df: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    good = df[df[DLQ_COLUMN].isna()].drop(columns=[DLQ_COLUMN]).reset_index(drop=True)
    dead = df[df[DLQ_COLUMN].notna()].reset_index(drop=True)
    return good, dead
