"""A REAL (small) OCR engine: fixed-pitch template-matching over page
images — the M17 heavy path with an actual image→text implementation.

The reference shells out to ocrmypdf/tesseract
(``gc_ocr/utils.py:49-158``); neither binary exists in this
environment, so this module implements the same job honestly at a
reduced scope: a classic 5×7 dot-matrix font (the OCR-A/OCR-B idea —
fixed-pitch glyphs designed to be machine-readable), a rasterizer that
renders page text into Netpbm images through the repo's real PPM codec
(``codecs.build_ppm``), and a recognizer that segments the fixed grid
and classifies each cell by MINIMUM HAMMING DISTANCE against the font
templates — i.e. genuine template-matching OCR (the legacy Tesseract
classifier's shape), tolerant to bit noise up to half the minimum
inter-glyph distance per cell.

Everything is vectorized: rendering scatters glyph bitmaps with one
fancy-index assignment per page; recognition reshapes the page into an
``(n_cells, 35)`` bit matrix and classifies ALL cells with one
broadcasted XOR-popcount against the template matrix. The engine holds
its template matrix as actor state (build once per worker in
``__init__`` — ST1).
"""

from __future__ import annotations

import numpy as np

from .codecs import build_ppm, parse_ppm

# Classic 5x7 dot-matrix glyphs (public-domain dot patterns; row ints,
# bit 4 = leftmost column). Coverage: A-Z, 0-9, space and the
# punctuation the synthetic corpora use.
FONT_5X7: dict[str, tuple[int, ...]] = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x11, 0x19, 0x15, 0x13, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0A),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x11, 0x0A, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    " ": (0, 0, 0, 0, 0, 0, 0),
    ".": (0, 0, 0, 0, 0, 0x0C, 0x0C),
    ",": (0, 0, 0, 0, 0x0C, 0x04, 0x08),
    "-": (0, 0, 0, 0x1F, 0, 0, 0),
    ":": (0, 0x0C, 0x0C, 0, 0x0C, 0x0C, 0),
}

GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = 6, 9   # 1px horizontal / 2px vertical inter-glyph gap
MARGIN = 2


def _glyph_bits(ch: str) -> np.ndarray:
    rows = FONT_5X7[ch]
    return np.array(
        [[(r >> (GLYPH_W - 1 - c)) & 1 for c in range(GLYPH_W)] for r in rows],
        dtype=bool,
    )


_CHARS = sorted(FONT_5X7)
_TEMPLATES = np.stack([_glyph_bits(c).reshape(-1) for c in _CHARS])  # (C, 35)


def min_template_distance() -> int:
    """Smallest pairwise Hamming distance between two glyph templates —
    the noise budget: per-cell bit noise strictly below half this is
    guaranteed not to flip a classification."""
    d = (_TEMPLATES[:, None, :] != _TEMPLATES[None, :, :]).sum(axis=2)
    np.fill_diagonal(d, 10**9)
    return int(d.min())


def render_page_ppm(text: str, noise_bits: int = 0, seed: int = 0) -> bytes:
    """Rasterize page text (newline-delimited, font charset only) into a
    P6 PPM: white background, black glyphs on the fixed 6x9 grid.
    ``noise_bits`` flips that many pixels (deterministic in ``seed``),
    at most one per cell — the scanner-noise the recognizer must
    survive."""
    lines = text.split("\n")
    n_cols = max((len(ln) for ln in lines), default=0)
    n_rows = len(lines)
    h = 2 * MARGIN + n_rows * CELL_H
    w = 2 * MARGIN + max(1, n_cols) * CELL_W
    ink = np.zeros((h, w), dtype=bool)
    for r, ln in enumerate(lines):
        y0 = MARGIN + r * CELL_H
        for c, ch in enumerate(ln):
            bits = _glyph_bits(ch)  # KeyError on uncovered char: loud
            x0 = MARGIN + c * CELL_W
            ink[y0 : y0 + GLYPH_H, x0 : x0 + GLYPH_W] |= bits
    if noise_bits:
        rng = np.random.default_rng(seed)
        cells = rng.choice(n_rows * n_cols, size=min(noise_bits, n_rows * n_cols),
                           replace=False)
        for cell in cells:
            r, c = divmod(int(cell), n_cols)
            y = MARGIN + r * CELL_H + int(rng.integers(GLYPH_H))
            x = MARGIN + c * CELL_W + int(rng.integers(GLYPH_W))
            ink[y, x] ^= True
    img = np.where(ink[..., None], 0, 255).astype(np.uint8)
    return build_ppm(np.repeat(img, 3, axis=2))


class GlyphOcr:
    """Template-matching recognizer; template matrices (BOTH atlases —
    fixed-pitch 5×7 grid and proportional 7×9 valley-segmented) built
    once per instance (hold one per actor). ``read_page`` decodes the
    page under each atlas hypothesis and keeps the higher-confidence
    result (lower mean min-Hamming per segment) — the per-page atlas
    router, the way an OCR engine picks a layout/script hypothesis."""

    def __init__(self):
        self.templates = _TEMPLATES
        self.chars = np.array(_CHARS)

    def read_page(self, payload: bytes) -> str:
        img = parse_ppm(payload)
        ink = img.mean(axis=2) < 128
        # geometry pre-router: the renderers' line pitches differ (9 vs
        # 11), so page height usually identifies the atlas outright —
        # h = 2·MARGIN + r·CELL_H (fixed) vs 2·MARGIN + r·LINE_H (prop).
        # Only height-ambiguous pages (both pitches divide, e.g. 99 rows
        # of pixels) pay the dual decode + confidence vote.
        body = ink.shape[0] - 2 * MARGIN
        fixed_ok = body > 0 and body % CELL_H == 0
        prop_ok = body > 0 and body % LINE_H == 0
        if fixed_ok and not prop_ok:
            return _read_page_fixed(ink)[0]
        if prop_ok and not fixed_ok:
            return _read_page_prop(ink)[0]
        fixed_text, fixed_score = _read_page_fixed(ink)
        prop_text, prop_score = _read_page_prop(ink)
        return fixed_text if fixed_score <= prop_score else prop_text


# ---------------------------------------------------------------------------
# Second atlas (round-5, M17 depth): a PROPORTIONAL 7×9 font with
# variable glyph widths — different geometry, different segmentation.
# Glyph shapes derive from the 5×7 dot patterns by nearest-neighbor
# upscale to 7×9, then per-glyph trimming of empty side columns (so "I"
# really is narrower than "W" — honest proportional metrics). The
# recognizer cannot use the fixed grid: it finds glyph boundaries by
# COLUMN-HISTOGRAM VALLEYS (runs of ink-free columns inside each line
# band) — the classic segmentation step of template-matching OCR — and
# classifies every segment of the page with one broadcasted Hamming
# pass against the 7×9 templates. ``GlyphOcr.read_page`` routes between
# the two atlases per page by decode confidence (mean min-distance),
# the way an OCR engine picks a script/layout hypothesis.
# ---------------------------------------------------------------------------

GLYPH9_W, GLYPH9_H = 7, 9
LINE_H = GLYPH9_H + 2       # 2px leading between line bands
GAP_W = 1                   # inter-glyph valley width
SPACE_ADV = 4               # a space advances cursor by 4 blank columns


def _scale_7x9(bits: np.ndarray) -> np.ndarray:
    """5×7 → 7×9 nearest-neighbor upscale (deterministic index map)."""
    rr = np.clip((np.arange(GLYPH9_H) * GLYPH_H) // GLYPH9_H, 0, GLYPH_H - 1)
    cc = np.clip((np.arange(GLYPH9_W) * GLYPH_W) // GLYPH9_W, 0, GLYPH_W - 1)
    return bits[np.ix_(rr, cc)]


def _prop_glyph(ch: str) -> np.ndarray:
    """Trimmed proportional 7×9 glyph (empty side columns removed)."""
    g = _scale_7x9(_glyph_bits(ch))
    cols = g.any(axis=0)
    if not cols.any():          # space renders as pure advance
        return np.zeros((GLYPH9_H, 0), dtype=bool)
    x0, x1 = np.flatnonzero(cols)[[0, -1]]
    return g[:, x0 : x1 + 1]


_PROP_CHARS = [c for c in _CHARS if c != " "]
_PROP_GLYPHS = {c: _prop_glyph(c) for c in _PROP_CHARS}
# templates padded left-aligned to the max width for one-shot Hamming
_PROP_TEMPLATES = np.stack([
    np.pad(_PROP_GLYPHS[c],
           ((0, 0), (0, GLYPH9_W - _PROP_GLYPHS[c].shape[1]))).reshape(-1)
    for c in _PROP_CHARS
])  # (C, 63)


def render_page_ppm_prop(text: str, noise_bits: int = 0, seed: int = 0) -> bytes:
    """Rasterize page text in the PROPORTIONAL 7×9 font: glyphs advance
    by their own trimmed width + a 1-column valley; spaces advance
    ``SPACE_ADV`` blank columns. ``noise_bits`` flips that many pixels,
    each INSIDE some glyph's bounding box (at most one per glyph) — the
    valley columns stay clean so segmentation is exercised against
    in-glyph noise, the regime the Hamming classifier is built for."""
    lines = text.split("\n")
    boxes: list[tuple[int, int, np.ndarray]] = []  # (y0, x0, glyph)
    widths = []
    for r, ln in enumerate(lines):
        x = MARGIN
        y0 = MARGIN + r * LINE_H
        for ch in ln:
            if ch == " ":
                x += SPACE_ADV
                continue
            g = _PROP_GLYPHS[ch]  # KeyError on uncovered char: loud
            boxes.append((y0, x, g))
            x += g.shape[1] + GAP_W
        widths.append(x)
    h = 2 * MARGIN + len(lines) * LINE_H
    w = max(widths, default=MARGIN) + MARGIN
    ink = np.zeros((h, max(w, 1)), dtype=bool)
    for y0, x0, g in boxes:
        ink[y0 : y0 + GLYPH9_H, x0 : x0 + g.shape[1]] |= g
    if noise_bits and boxes:
        rng = np.random.default_rng(seed)
        hit = rng.choice(len(boxes), size=min(noise_bits, len(boxes)),
                         replace=False)
        for k in hit:
            y0, x0, g = boxes[int(k)]
            y = y0 + int(rng.integers(GLYPH9_H))
            x = x0 + int(rng.integers(g.shape[1]))
            ink[y, x] ^= True
    img = np.where(ink[..., None], 0, 255).astype(np.uint8)
    return build_ppm(np.repeat(img, 3, axis=2))


def _read_page_fixed(ink: np.ndarray) -> tuple[str, float]:
    """Fixed-grid decode → (text, mean min-Hamming per cell)."""
    h, w = ink.shape
    n_rows = (h - 2 * MARGIN) // CELL_H
    n_cols = (w - 2 * MARGIN) // CELL_W
    if n_rows <= 0 or n_cols <= 0:
        return "", float("inf")
    core = ink[MARGIN : MARGIN + n_rows * CELL_H,
               MARGIN : MARGIN + n_cols * CELL_W]
    cells = (
        core.reshape(n_rows, CELL_H, n_cols, CELL_W)
        .transpose(0, 2, 1, 3)[:, :, :GLYPH_H, :GLYPH_W]
        .reshape(n_rows * n_cols, GLYPH_H * GLYPH_W)
    )
    dist = (cells[:, None, :] != _TEMPLATES[None, :, :]).sum(axis=2)
    best = dist.min(axis=1)
    chars = np.array(_CHARS)
    decoded = chars[dist.argmin(axis=1)].reshape(n_rows, n_cols)
    lines = ["".join(row).rstrip() for row in decoded]
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines), float(best.mean()) if len(best) else float("inf")


def _read_page_prop(ink: np.ndarray) -> tuple[str, float]:
    """Proportional decode: line bands at LINE_H pitch, glyph runs by
    column-histogram valleys, spaces from valley widths, ONE broadcast
    Hamming pass over every segment of the page."""
    h, w = ink.shape
    n_rows = (h - 2 * MARGIN) // LINE_H
    if n_rows <= 0 or w <= 2 * MARGIN:
        return "", float("inf")
    segs: list[np.ndarray] = []          # (63,) padded bit vectors
    layout: list[list[tuple[int, int]]] = []  # per line: (seg idx, n_spaces_before)
    for r in range(n_rows):
        y0 = MARGIN + r * LINE_H
        band = ink[y0 : y0 + GLYPH9_H, MARGIN : w - MARGIN]
        inked = band.any(axis=0)
        idx = np.flatnonzero(inked)
        line: list[tuple[int, int]] = []
        if len(idx):
            # runs of consecutive inked columns = glyph segments
            brk = np.flatnonzero(np.diff(idx) > 1)
            starts = np.concatenate([[0], brk + 1])
            ends = np.concatenate([brk, [len(idx) - 1]])
            prev_end = None
            for s, e in zip(idx[starts], idx[ends]):
                gap = 0 if prev_end is None else s - prev_end - 1
                n_spaces = max(0, round((gap - GAP_W) / SPACE_ADV))
                seg = band[:, s : e + 1]
                if seg.shape[1] > GLYPH9_W:      # noise merged? clip loudly
                    seg = seg[:, :GLYPH9_W]
                pad = np.pad(seg, ((0, 0), (0, GLYPH9_W - seg.shape[1])))
                line.append((len(segs), int(n_spaces)))
                segs.append(pad.reshape(-1))
                prev_end = e
        layout.append(line)
    if not segs:
        return "", float("inf")
    mat = np.stack(segs)  # (S, 63)
    dist = (mat[:, None, :] != _PROP_TEMPLATES[None, :, :]).sum(axis=2)
    best_i = dist.argmin(axis=1)
    best_d = dist.min(axis=1)
    chars = np.array(_PROP_CHARS)
    out_lines = []
    for line in layout:
        parts = []
        for seg_i, n_sp in line:
            parts.append(" " * n_sp)
            parts.append(str(chars[best_i[seg_i]]))
        out_lines.append("".join(parts).rstrip())
    while out_lines and not out_lines[-1]:
        out_lines.pop()
    return "\n".join(out_lines), float(best_d.mean())
