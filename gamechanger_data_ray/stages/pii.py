"""PII detection + redaction stage — a training-data-pipeline extension
(the reference has no PII pass; this is the standard pre-training corpus
hygiene op, same actor-pool shape as the other text stages).

Scale design: compiled patterns once per actor (ST1), counting and
redaction are C-level vectorized ``Series.str`` passes per pattern over
the whole batch — no Python row loop; output is counts + redacted text,
so downstream stages never see raw PII.
"""

from __future__ import annotations

import re

import pandas as pd

# detection patterns, applied in this order; counts are measured on the
# ORIGINAL text (order-independent), redaction rewrites sequentially
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
)


class PiiRedactor:
    """Actor-pool stage: (doc_id, text) → (doc_id, n_email, n_ssn,
    n_phone, n_ipv4, n_residual, text) with every match replaced by
    ``[PII:<TYPE>]``. ``n_residual`` re-scans the REDACTED text with all
    patterns — always 0, the machine-checked proof that redaction removed
    everything it counted."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.patterns = [(name, re.compile(pat)) for name, pat in PII_PATTERNS]
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        col = df[self.text_col]
        out = pd.DataFrame({"doc_id": df[self.id_col].to_numpy()})
        for name, pat in self.patterns:
            out[f"n_{name}"] = col.str.count(pat).astype("int64")
        for name, pat in self.patterns:
            col = col.str.replace(pat, f"[PII:{name.upper()}]", regex=True)
        residual = pd.Series(0, index=col.index, dtype="int64")
        for _, pat in self.patterns:
            residual += col.str.count(pat).astype("int64")
        out["n_residual"] = residual
        out["text"] = col
        return out
