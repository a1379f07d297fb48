"""Batched re-OCR orchestration (M17).

Reference shape: ``common/document_parser/process.py:189-239`` checks
every file's OCR status (collecting ``bad_page_nums``), batches the
failures, and pushes them through a dedicated heavy pool
(``gc_ocr/utils.py:49-158``'s PDFOCR with per-file thread counts),
leaving clean files untouched. Ray-Data-first, that split/heavy-pool/
rejoin collapses into ONE actor-pool stage that routes WITHIN each
batch: clean rows pass through zero-copy, flagged rows take the
expensive path — no second scan of the corpus, no union shuffle, and
the pool's ``num_cpus``/``batch_size`` make it the dedicated heavy pool.
(When repair cost per row dwarfs scan cost — real OCR renders pages —
prefer the two-branch form: persist the gate output, filter the flagged
slice, re-OCR it alone, and union; the fused router below keeps the
same Repairer contract either way.)

The OCR binary itself (ocrmypdf/tesseract) is absent in this
environment, so the heavy path ships with one REAL repairer the gate
can actually exercise end-to-end — :class:`MojibakeRepairer`, fixing
UTF-8 text that was mis-decoded as latin-1 (the classic ingest
corruption: ``café`` → ``cafÃ©``) by re-encoding latin-1 and re-decoding
UTF-8 — plus the :class:`Repairer` hook a deployment implements with the
real OCR engine. Detection mirrors the reference's bad-page heuristics
(``common/utils/file_utils.py:43-80``): U+FFFD ratio (see
``text.OcrQualityGate``) and the mojibake lead-byte signature here.
"""

from __future__ import annotations

import re

import pandas as pd

# A valid UTF-8 multi-byte sequence seen through a latin-1 decode: any
# lead byte 0xC2-0xF4 (covering 2-byte Latin/Greek/Cyrillic/Hebrew/Arabic
# leads 0xC2-0xDF, 3-byte CJK/symbol leads 0xE0-0xEF, and 4-byte emoji
# leads 0xF0-0xF4) followed by a continuation byte 0x80-0xBF — latin-1
# maps every byte to the same-numbered codepoint, so the signature is
# exactly those two character ranges
_MOJIBAKE = re.compile("[\u00c2-\u00f4][\u0080-\u00bf]")


def looks_mojibake(text: str) -> bool:
    """True when the text carries the latin-1-decoded-UTF-8 signature."""
    return bool(_MOJIBAKE.search(text))


def repair_mojibake(text: str) -> str:
    """Invert a latin-1 mis-decode of UTF-8 bytes. Text that does not
    round-trip (it wasn't mojibake after all) comes back unchanged —
    mirroring the reference's swallow-and-continue per-file OCR errors."""
    try:
        return text.encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return text


class Repairer:
    """The heavy re-OCR hook: a deployment implements ``repair_one`` with
    the real engine (ocrmypdf on the flagged pages, ``utils.py:110-131``).
    Contract: text in, repaired text out, never raise per row."""

    def repair_one(self, text: str) -> str:
        raise NotImplementedError(
            "re-OCR engine binding: implement repair_one (e.g. ocrmypdf)"
        )


class MojibakeRepairer(Repairer):
    """REAL repairer: fixes latin-1-mis-decoded UTF-8."""

    def repair_one(self, text: str) -> str:
        return repair_mojibake(text)


class TesseractOcr:
    """The external-binary plug point, bound (reference:
    ``gc_ocr/utils.py:49-158`` shells out to ocrmypdf/tesseract). When
    the ``tesseract`` binary exists this adapter shells a page image
    through it (stdin TIFF/PNM → stdout text, the same per-page call
    ocrmypdf makes); in this sandbox it raises the documented
    NotImplementedError so deployments know exactly where the binary
    plugs in. ``available()`` gates call sites — the glyph engine
    (``glyph_ocr.GlyphOcr``) remains the in-sandbox recognizer."""

    @staticmethod
    def available() -> bool:
        import shutil

        return shutil.which("tesseract") is not None

    def read_page(self, payload: bytes, lang: str = "eng") -> str:
        if not self.available():
            raise NotImplementedError(
                "external OCR binding: tesseract binary not present — "
                "in-sandbox pages go through glyph_ocr.GlyphOcr instead"
            )
        import subprocess

        # tesseract reads NetPBM directly; '-' streams stdin → stdout
        out = subprocess.run(
            ["tesseract", "-", "-", "-l", lang, "--psm", "6"],
            input=payload, capture_output=True, check=True,
        )
        return out.stdout.decode("utf-8", errors="replace").rstrip("\n")


class ReocrRouter:
    """Fused gate + heavy-path router (the ``process.py:189-239``
    orchestration as one actor-pool stage): flag rows whose text shows
    the corruption signature, run ONLY those through the repairer,
    pass the rest through untouched. Adds ``was_repaired``; run with a
    dedicated pool: ``map_batches(ReocrRouter, fn_constructor_args=...,
    concurrency=(1, pool), batch_size=small, num_cpus=1)``."""

    def __init__(self, repairer: Repairer | None = None, text_col: str = "text"):
        self.repairer = repairer or MojibakeRepairer()
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        flagged = batch[self.text_col].map(looks_mojibake)
        repaired_any = pd.Series(False, index=batch.index)
        if flagged.any():
            # batch the bad pages: only flagged rows enter the heavy path
            original = batch.loc[flagged, self.text_col]
            repaired = original.map(self.repairer.repair_one)
            batch.loc[flagged, self.text_col] = repaired
            # a row counts as repaired only if the heavy path changed it
            repaired_any.loc[flagged] = repaired.ne(original)
        batch["was_repaired"] = repaired_any
        return batch


class GlyphOcrRepairer(Repairer):
    """REAL image→text re-OCR (``glyph_ocr.GlyphOcr``): recovers a
    page's text from its page image by fixed-pitch template matching.
    Engine state (template matrix) builds once per instance — hold one
    per actor. ``repair_one`` satisfies the text-only contract by
    returning the input unchanged (no image, nothing to re-OCR);
    the image path is ``repair_page``."""

    def __init__(self):
        from .glyph_ocr import GlyphOcr

        self.engine = GlyphOcr()

    def repair_one(self, text: str) -> str:
        return text

    def repair_page(self, payload: bytes) -> str:
        return self.engine.read_page(payload)


class PageImageReocrRouter:
    """The M17 orchestration with a REAL OCR engine behind the heavy
    path: rows whose text fails the replacement-char gate
    (``text.OcrQualityGate`` heuristic, ``file_utils.py:43-80``) are
    re-OCRed FROM THEIR PAGE IMAGE (``image_col`` payload) by the
    glyph engine; clean rows pass through untouched and their payload
    is never decoded. Same fused split/heavy-pool/rejoin shape as
    :class:`ReocrRouter`; run as a dedicated actor pool with a small
    batch_size (wide binary rows)."""

    def __init__(self, text_col: str = "text", image_col: str = "page_image",
                 threshold: float = 0.2):
        self.repairer = GlyphOcrRepairer()
        self.text_col = text_col
        self.image_col = image_col
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from .text import replacement_char_ratio

        batch = batch.copy()
        flagged = batch[self.text_col].map(replacement_char_ratio) > self.threshold
        repaired_any = pd.Series(False, index=batch.index)
        if flagged.any():
            original = batch.loc[flagged, self.text_col]
            repaired = batch.loc[flagged, self.image_col].map(
                self.repairer.repair_page)
            batch.loc[flagged, self.text_col] = repaired
            repaired_any.loc[flagged] = repaired.ne(original)
        batch["was_repaired"] = repaired_any
        return batch
