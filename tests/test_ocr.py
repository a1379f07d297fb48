"""Batched re-OCR orchestration (M17): mojibake signature detection,
the real latin-1/UTF-8 repair inverse, router split semantics (only
flagged rows touch the heavy path), and the Repairer hook contract."""

import pandas as pd
import pytest

from gamechanger_data_ray.stages.ocr import (
    MojibakeRepairer,
    ReocrRouter,
    Repairer,
    looks_mojibake,
    repair_mojibake,
)


def _corrupt(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


@pytest.mark.parametrize(
    "clean",
    [
        "café au lait",
        "em — dash and № sign",
        "naïve façade über straße",
        "mixed ascii with é at the end é",
    ],
)
def test_repair_inverts_corruption(clean):
    bad = _corrupt(clean)
    assert bad != clean
    assert looks_mojibake(bad)
    assert not looks_mojibake(clean)
    assert repair_mojibake(bad) == clean


def test_pure_ascii_is_fixed_point():
    s = "plain ascii text 123"
    assert _corrupt(s) == s  # ASCII is invariant — nothing to detect
    assert not looks_mojibake(s)
    assert repair_mojibake(s) == s


def test_repair_never_raises_on_non_mojibake():
    # € is not latin-1-encodable: repair must return input unchanged
    assert repair_mojibake("price €5") == "price €5"


def test_router_splits_within_batch():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["clean ascii", _corrupt("café row"), "also clean é"],
        }
    )
    out = ReocrRouter()(df)
    assert out["text"].tolist() == ["clean ascii", "café row", "also clean é"]
    assert out["was_repaired"].tolist() == [False, True, False]


def test_router_all_clean_batch_passthrough():
    df = pd.DataFrame({"doc_id": [1], "text": ["nothing wrong"]})
    out = ReocrRouter()(df)
    assert out["was_repaired"].tolist() == [False]
    assert out["text"].tolist() == ["nothing wrong"]


def test_base_repairer_is_an_explicit_hook():
    with pytest.raises(NotImplementedError):
        Repairer().repair_one("x")
    assert MojibakeRepairer().repair_one(_corrupt("é")) == "é"


@pytest.mark.parametrize(
    "clean",
    ["привет мир", "Ćao svima", "日本語テキスト", "emoji 🙂 here", "ελληνικά"],
)
def test_mojibake_detection_covers_all_utf8_lead_bytes(clean):
    """Code-review regression: Cyrillic/Greek/CJK/emoji leads (0xC4-0xF4)
    must be detected, not just Western-European 0xC2/0xC3."""
    bad = _corrupt(clean)
    assert looks_mojibake(bad) and not looks_mojibake(clean)
    assert repair_mojibake(bad) == clean


# ---------------------------------------------------------------------------
# Real image→text engine (stages/glyph_ocr.py)
# ---------------------------------------------------------------------------


def test_glyph_ocr_roundtrip_exact():
    from gamechanger_data_ray.stages.glyph_ocr import GlyphOcr, render_page_ppm

    text = "DOC 1234 CODE 56: STATUS OK.\nTOKENS 7-3, END."
    assert GlyphOcr().read_page(render_page_ppm(text)) == text


def test_glyph_ocr_survives_per_cell_noise():
    """One flipped pixel per cell is strictly under half the minimum
    inter-template Hamming distance, so classification cannot move."""
    from gamechanger_data_ray.stages.glyph_ocr import (
        GlyphOcr, min_template_distance, render_page_ppm)

    assert min_template_distance() >= 3
    ocr = GlyphOcr()
    text = "NOISY SCAN 0189: A-Z, OK."
    for seed in range(5):
        assert ocr.read_page(render_page_ppm(text, noise_bits=26, seed=seed)) == text


def test_glyph_templates_pairwise_distinct():
    from gamechanger_data_ray.stages.glyph_ocr import _TEMPLATES

    import numpy as np

    d = (_TEMPLATES[:, None, :] != _TEMPLATES[None, :, :]).sum(axis=2)
    np.fill_diagonal(d, 1)
    assert d.min() >= 1


def test_page_image_router_reocrs_only_flagged_rows():
    import pandas as pd

    from gamechanger_data_ray.stages.glyph_ocr import render_page_ppm
    from gamechanger_data_ray.stages.ocr import PageImageReocrRouter

    clean, garbled = "CLEAN PAGE 1.", "TRUE TEXT 2."
    df = pd.DataFrame(
        {"text": [clean, "�" * 8],
         "page_image": [render_page_ppm(clean),
                        render_page_ppm(garbled, noise_bits=4, seed=2)]}
    )
    out = PageImageReocrRouter()(df)
    assert out["text"].tolist() == [clean, garbled]
    assert out["was_repaired"].tolist() == [False, True]


def test_prop_atlas_roundtrip_and_router():
    """Round 5: the proportional 7×9 valley-segmented atlas round-trips
    exactly (spaces reconstructed from valley widths, per-glyph noise
    absorbed) and the per-page confidence router picks the right
    recognizer for BOTH font styles on the same engine instance."""
    from gamechanger_data_ray.stages.glyph_ocr import (
        GlyphOcr,
        render_page_ppm,
        render_page_ppm_prop,
    )

    eng = GlyphOcr()
    texts = [
        "HELLO WORLD: 42.",
        "A-B, C: 0123456789.\nSECOND LINE HERE.",
        "W I D E AND NARROW II WW.",
    ]
    for i, t in enumerate(texts):
        assert eng.read_page(render_page_ppm_prop(t, noise_bits=i, seed=i)) == t
        assert eng.read_page(render_page_ppm(t, noise_bits=i, seed=i)) == t


def test_prop_glyphs_are_proportional():
    """The second atlas is genuinely proportional — trimmed widths
    differ across glyphs — and its templates are pairwise distinct."""
    import numpy as np

    from gamechanger_data_ray.stages.glyph_ocr import (
        _PROP_GLYPHS,
        _PROP_TEMPLATES,
    )

    widths = {c: g.shape[1] for c, g in _PROP_GLYPHS.items()}
    assert len(set(widths.values())) > 1, widths
    assert widths["I"] < widths["W"]
    d = (_PROP_TEMPLATES[:, None, :] != _PROP_TEMPLATES[None, :, :]).sum(axis=2)
    np.fill_diagonal(d, 10**9)
    assert d.min() >= 1


def test_tesseract_plug_point():
    """The external-binary adapter: refuses loudly without the binary,
    and (skip-if-absent) round-trips a rendered page through the real
    tesseract when one exists."""
    import pytest

    from gamechanger_data_ray.stages.glyph_ocr import render_page_ppm
    from gamechanger_data_ray.stages.ocr import TesseractOcr

    eng = TesseractOcr()
    if not TesseractOcr.available():
        with pytest.raises(NotImplementedError):
            eng.read_page(b"P6 1 1 255 \x00\x00\x00")
        pytest.skip("tesseract binary not present (documented plug point)")
    got = eng.read_page(render_page_ppm("HELLO 42."))
    assert "HELLO" in got.upper()
