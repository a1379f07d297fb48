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
    """Best-effort ASCII transliteration: non-ascii codepoints dropped
    (``str.encode('ascii', 'ignore')`` semantics), fully vectorized.

    Works directly on the column's flattened UTF-8 buffer: every byte of
    a multi-byte codepoint has the high bit set, so dropping bytes
    >= 0x80 removes exactly the non-ascii codepoints; new offsets are the
    cumulative kept-byte counts at the old row boundaries. One numpy pass
    over the payload, no Python per row, nulls preserved."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = arr.cast(pa.large_binary())
    if s.offset:
        # rebase a sliced array so the validity bitmap's bit offset is 0
        # (from_buffers below reuses it verbatim)
        s = s.take(pa.array(np.arange(len(s), dtype=np.int64)))
    offs = np.frombuffer(s.buffers()[1], dtype=np.int64)[
        s.offset : s.offset + len(s) + 1
    ]
    data = (
        np.frombuffer(s.buffers()[2], dtype=np.uint8)
        if s.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    lo, hi = offs[0], offs[-1]
    window = data[lo:hi]
    keep = window < 0x80
    new_data = window[keep]
    # kept-byte count before each old offset → new offsets, rebased
    kept_cum = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
    new_offs = kept_cum[offs - lo]
    null_buf = s.buffers()[0]
    return pa.Array.from_buffers(
        pa.large_string(),
        len(s),
        [null_buf, pa.py_buffer(new_offs.tobytes()), pa.py_buffer(new_data.tobytes())],
        null_count=s.null_count,
    ).cast(pa.string())


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
