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
