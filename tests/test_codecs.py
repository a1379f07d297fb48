"""Golden-bytes tests for the real pure-Python media codecs (S8/K12
non-stub path): PDF build → extract round-trips, a hand-written golden
PDF byte string parses to the exact text, PNM variants decode to the
same pixels, and nearest-neighbor resize matches hand-computed indices.

Reference parity: ``common/document_parser/lib/pdf_reader.py:7-14`` +
``lib/pages.py:26-33`` (per-page text), ``dataPipelines/gc_thumbnails/
utils.py:38-47`` (decode → scale → re-encode).
"""

import zlib

import numpy as np
import pytest

from gamechanger_data_ray.stages import codecs, multimodal as mm


# ---------------------------------------------------------------------------
# PDF round-trip
# ---------------------------------------------------------------------------

def test_pdf_roundtrip_multiline_and_escapes():
    pages = [
        "Hello, world!\nSecond line\twith tab",
        "Parens (nested (deep)) and back\\slash",
        "",  # blank page survives IN POSITION (page_idx must not renumber)
        "Trailing page",
    ]
    payload = codecs.build_pdf(pages)
    assert payload.startswith(b"%PDF-1.4") and payload.rstrip().endswith(b"%%EOF")
    got = codecs.extract_pdf_text(payload)
    assert got == pages


def test_pdf_roundtrip_uncompressed():
    pages = ["plain stream", "no filter here"]
    got = codecs.extract_pdf_text(codecs.build_pdf(pages, compress=False))
    assert got == pages


def test_pdf_length_slices_exactly_trailing_0x0d():
    """A compressed stream whose last byte is 0x0D must survive: without
    honoring /Length, the endstream EOL scan would eat that data byte
    (the bug the /Length slice fixed)."""
    for i in range(200):
        text = f"doc {i} " + "x" * i
        payload = codecs.build_pdf([text])
        assert codecs.extract_pdf_text(payload) == [text]


def test_pdf_golden_handwritten_bytes():
    """A PDF NOT produced by build_pdf: hex strings, TJ arrays, octal
    escapes, and an uncompressed stream with explicit /Length."""
    content = b"BT /F1 9 Tf (A\\051B) Tj T* [<48656C6C6F> (!)] TJ (\\101) ' ET"
    stream = (
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream"
    )
    pdf = b"%PDF-1.4\n1 0 obj\n" + stream + b"\nendobj\n%%EOF\n"
    # Tj = "A)B"; TJ = "Hello!" after T* newline; ' starts a new line "A"
    assert codecs.extract_pdf_text(pdf) == ["A)B\nHello!\nA"]


def test_pdf_unsupported_filter_skipped_not_fatal():
    content = zlib.compress(b"BT (gone) Tj ET")
    bad = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
        + b" /Filter /LZWDecode >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    good = codecs.build_pdf(["kept"])
    assert codecs.extract_pdf_text(bad + good) == ["kept"]


def test_pdf_garbage_payload_yields_no_pages():
    assert codecs.extract_pdf_text(b"\x00\x01 not a pdf at all") == []
    assert codecs.extract_pdf_text(b"") == []


# ---------------------------------------------------------------------------
# PNM decode / resize / re-encode
# ---------------------------------------------------------------------------

def _ramp(h, w):
    return (np.arange(h * w * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(h, w, 3)


def test_ppm_p6_roundtrip_golden_header():
    img = _ramp(6, 8)
    payload = codecs.build_ppm(img)
    assert payload[:11] == b"P6\n8 6\n255\n"
    assert len(payload) == 11 + 6 * 8 * 3
    assert np.array_equal(codecs.parse_ppm(payload), img)


def test_pnm_variants_decode_identically():
    img = _ramp(4, 5)
    p6 = codecs.build_ppm(img)
    flat = img.reshape(-1)
    p3 = b"P3\n# comment line\n5 4\n255\n" + " ".join(map(str, flat)).encode()
    assert np.array_equal(codecs.parse_ppm(p3), img)
    gray = img[:, :, 0]
    p5 = b"P5\n5 4\n255\n" + gray.tobytes()
    out = codecs.parse_ppm(p5)
    assert out.shape == (4, 5, 3)
    assert np.array_equal(out[:, :, 0], gray) and np.array_equal(out[:, :, 2], gray)
    p2 = b"P2\n5 4\n255\n" + " ".join(map(str, gray.reshape(-1))).encode()
    assert np.array_equal(codecs.parse_ppm(p2), out)


def test_pnm_maxval_rescale():
    # maxval 100: 50 → 127.5 → 127 (numpy half-to-even); 40 → 102 exactly
    assert codecs.parse_ppm(b"P2\n1 1\n100\n50")[0, 0, 0] == 127
    assert codecs.parse_ppm(b"P2\n1 1\n100\n40")[0, 0, 0] == 102


def test_pnm_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.parse_ppm(b"JFIF not pnm")


def test_resize_nearest_golden_indices():
    img = _ramp(4, 4)
    out = codecs.resize_nearest(img, 2, 2)
    # rows/cols picked at floor(i*4/2) = 0, 2
    assert np.array_equal(out, img[np.ix_([0, 2], [0, 2])])
    up = codecs.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], img)  # every source pixel survives


# ---------------------------------------------------------------------------
# Ray-stage wrappers
# ---------------------------------------------------------------------------

def test_pdf_text_extractor_stage():
    pdfs = [codecs.build_pdf(["page one", "page two"]), b"not a pdf"]
    t = mm.to_media_table([7, 8], pdfs, "application/pdf")
    out = mm.PdfTextExtractor()(t)
    assert out["media_id"].to_pylist() == [7, 7]
    assert out["page_idx"].to_pylist() == [0, 1]
    assert out["page_text"].to_pylist() == ["page one", "page two"]


def test_ppm_decoder_real_features():
    img = np.full((6, 8, 3), 10, np.uint8)
    img[:, :, 1] = 200
    t = mm.to_media_table([1], [codecs.build_ppm(img)], "image/x-portable-pixmap")
    out = mm.PpmDecoder()(t)
    f = np.asarray(out["feature"].combine_chunks().values, np.float32).reshape(-1, 8)
    assert f[0, 0] == 8 and f[0, 1] == 6  # w, h
    assert f[0, 2] == 10 and f[0, 3] == 200 and f[0, 4] == 10  # channel means
    assert f[0, 5] == pytest.approx(0.0, abs=1e-4)  # constant luma → zero std


def test_ppm_thumbnailer_real_resample():
    img = _ramp(6, 8)
    t = mm.to_media_table([1], [codecs.build_ppm(img)], "image/x-portable-pixmap")
    out = mm.PpmThumbnailer(max_side=4)(t)
    thumb = codecs.parse_ppm(out["payload"].to_pylist()[0])
    assert thumb.shape == (3, 4, 3)  # 8×6 scaled by 1/2
    assert np.array_equal(thumb, codecs.resize_nearest(img, 4, 3))
    # small images pass through unscaled
    small = mm.PpmThumbnailer(max_side=16)(t)
    assert np.array_equal(codecs.parse_ppm(small["payload"].to_pylist()[0]), img)


def test_decoder_dispatch_by_mime():
    assert mm.decoder_for("image/x-portable-pixmap") is mm.PpmDecoder
    assert mm.decoder_for("image/x-portable-graymap") is mm.PpmDecoder
    assert mm.decoder_for("video/mp4") is mm.FakeDecoder


# ---------------------------------------------------------------------------
# Property tests — round-trips hold on arbitrary inputs, not just goldens
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# latin-1-encodable, no control chars (build_pdf's documented domain)
_PDF_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255),
    min_size=1,
    max_size=200,
).filter(lambda s: s.strip())


@given(st.lists(_PDF_TEXT, min_size=1, max_size=4), st.booleans())
@settings(max_examples=150, deadline=None)
def test_pdf_roundtrip_property(pages, compress):
    got = codecs.extract_pdf_text(codecs.build_pdf(pages, compress=compress))
    assert got == pages


@given(st.integers(1, 12), st.integers(1, 12), st.integers(0))
@settings(max_examples=100, deadline=None)
def test_ppm_roundtrip_and_resize_property(w, h, seed):
    rng = np.random.default_rng(seed % 2**32)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.parse_ppm(codecs.build_ppm(img)), img)
    out_w, out_h = max(1, w // 2), max(1, h // 2)
    thumb = codecs.resize_nearest(img, out_w, out_h)
    assert thumb.shape == (out_h, out_w, 3)
    # every thumbnail pixel is a real source pixel (nearest-neighbor)
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    assert np.array_equal(thumb, img[rows[:, None], cols[None, :]])


def test_pdf_non_octal_digit_escape_drops_backslash():
    """Code-review regression: '\\8'/'\\9' are not octal — per spec the
    backslash drops and the digit stays; must not raise."""
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length 18 >>\nstream\n"
           b"BT (a\\8b\\9c) Tj ET\nendstream\nendobj\n")
    assert codecs.extract_pdf_text(pdf) == ["a8b9c"]


def test_pdf_blank_page_keeps_position():
    assert codecs.extract_pdf_text(codecs.build_pdf(["a", "", "c"])) == ["a", "", "c"]


def test_ppm_two_byte_samples_rejected():
    with pytest.raises(ValueError, match="maxval"):
        codecs.parse_ppm(b"P6\n2 1\n65535\n" + b"\xff\xff\x00\x00\x00\x00" * 2)


# --- WAV (RIFF/WAVE PCM) ----------------------------------------------------

def test_wav_roundtrip_16bit_exact_quantization():
    import numpy as np

    from gamechanger_data_ray.stages import codecs as c

    t = np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)
    rate, s = c.parse_wav(c.build_wav(t, 16000, bits=16))
    assert rate == 16000 and s.shape == (8000, 1)
    assert np.abs(s[:, 0] - t).max() < 1.0 / 32767 + 1e-9  # quantization only
    # byte-deterministic encode
    assert c.build_wav(t, 16000) == c.build_wav(t.copy(), 16000)


def test_wav_8bit_stereo_and_extra_chunks():
    import struct

    import numpy as np

    from gamechanger_data_ray.stages import codecs as c

    st = np.stack([np.linspace(-1, 1, 100), np.zeros(100)], axis=1)
    payload = c.build_wav(st, 8000, bits=8)
    rate, s = c.parse_wav(payload)
    assert rate == 8000 and s.shape == (100, 2)
    assert np.abs(s[:, 0] - st[:, 0]).max() < 1.0 / 127 + 1e-9
    assert np.abs(s[:, 1]).max() < 1.0 / 127 + 1e-9
    # tolerate a LIST chunk between fmt and data (spec-legal layout)
    fmt_at = payload.index(b"fmt ")
    data_at = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = payload[:data_at] + extra + payload[data_at:]
    rate2, s2 = c.parse_wav(spliced)
    assert rate2 == 8000 and np.array_equal(s2, s) and fmt_at < data_at


def test_wav_refuses_non_pcm_and_garbage():
    import pytest

    from gamechanger_data_ray.stages import codecs as c

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        c.parse_wav(b"\x00" * 40)
    import numpy as np
    good = c.build_wav(np.zeros(10), 8000)
    bad = good.replace(b"fmt \x10\x00\x00\x00\x01\x00",
                       b"fmt \x10\x00\x00\x00\x03\x00")  # tag 3 = float
    with pytest.raises(ValueError, match="format tag"):
        c.parse_wav(bad)


def test_wav_decoder_features_match_signal_math():
    import numpy as np

    from gamechanger_data_ray.stages import codecs as c
    from gamechanger_data_ray.stages.multimodal import WavDecoder, decoder_for

    assert decoder_for("audio/wav") is WavDecoder
    rate, freq, secs, amp = 16000, 200, 2.0, 0.5
    t = amp * np.sin(2 * np.pi * freq * np.arange(int(rate * secs)) / rate)
    f = WavDecoder().decode_one(c.build_wav(t, rate), "audio/wav")
    assert f[0] == pytest.approx(secs)                       # duration
    assert f[1] == rate and f[2] == 1.0                      # rate, channels
    assert f[3] == pytest.approx(amp / np.sqrt(2), rel=1e-3)  # sine RMS
    assert f[4] == pytest.approx(amp, rel=1e-3)              # peak
    assert f[5] == pytest.approx(2 * freq / rate, rel=0.02)  # ZCR of a sine
    assert abs(f[6]) < 1e-3                                  # no DC offset


# --- GIF (animated, LZW) ------------------------------------------------------

def _gray_frames(idx_frames, npal):
    import numpy as np

    out = []
    for idx in idx_frames:
        gray = (idx * (255 // max(1, npal - 1))).astype(np.uint8)
        out.append(np.stack([gray, gray, gray], axis=2))
    return out


def test_gif_roundtrip_battery():
    """Random / constant-run (KwKwK) / alternating index streams across
    palette sizes, multi-frame, exact equality — including an 80x80
    256-color frame that forces 12-bit code growth and a table reset."""
    import numpy as np

    from gamechanger_data_ray.stages import codecs as c

    rng = np.random.default_rng(42)
    cases = []
    for npal in (2, 4, 16, 251, 256):
        cases.append(_gray_frames([rng.integers(0, npal, (13, 17))
                                   for _ in range(4)], npal))
        cases.append(_gray_frames([np.full((9, 5), npal - 1)], npal))
        cases.append(_gray_frames(
            [np.indices((11, 7)).sum(axis=0) % npal], npal))
    cases.append(_gray_frames([rng.integers(0, 256, (80, 80))], 256))
    for frames in cases:
        got = c.parse_gif(c.build_gif(frames))
        assert len(got) == len(frames)
        for a, b in zip(frames, got):
            assert np.array_equal(a, b)


def test_gif_parser_handles_interlace_and_extensions():
    """A hand-spliced graphic-control extension is skipped; an
    interlaced frame (encoder rows re-ordered per the 4-pass scheme +
    interlace flag set) decodes back to the original."""
    import numpy as np

    from gamechanger_data_ray.stages import codecs as c

    rng = np.random.default_rng(7)
    frame = _gray_frames([rng.integers(0, 16, (16, 9))], 16)[0]
    payload = c.build_gif([frame])
    at = payload.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = payload[:at] + gce + payload[at:]
    assert np.array_equal(c.parse_gif(with_ext)[0], frame)

    # interlaced variant: permute rows into pass order, set the flag
    h = frame.shape[0]
    order = np.concatenate(
        [np.arange(s, h, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))])
    inter = c.build_gif([frame[order]])
    at = inter.index(b"\x2c")
    inter = inter[:at + 9] + bytes([inter[at + 9] | 0x40]) + inter[at + 10:]
    assert np.array_equal(c.parse_gif(inter)[0], frame)


def test_gif_refuses_garbage_and_too_many_colors():
    import numpy as np
    import pytest

    from gamechanger_data_ray.stages import codecs as c

    with pytest.raises(ValueError, match="not a GIF"):
        c.parse_gif(b"\x00" * 30)
    i = np.arange(300, dtype=np.int64)  # 300 distinct (r, g, 0) triples
    rgb = np.stack([i // 256, i % 256, np.zeros(300, dtype=np.int64)],
                   axis=1).astype(np.uint8).reshape(10, 30, 3)
    with pytest.raises(ValueError, match=">256"):
        c.build_gif([rgb])


def test_gif_frame_sampler_stage():
    import numpy as np
    import pyarrow as pa

    from gamechanger_data_ray.stages import codecs as c
    from gamechanger_data_ray.stages.multimodal import (
        GifFrameSampler,
        to_media_table,
    )

    rng = np.random.default_rng(3)
    frames = _gray_frames([rng.integers(0, 64, (6, 8)) for _ in range(5)], 64)
    batch = to_media_table([11], [c.build_gif(frames)], "image/gif")
    out = GifFrameSampler(every_k=2, thumb_w=4, thumb_h=3)(batch).to_pylist()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    assert all(r["n_frames"] == 5 for r in out)
    for r in out:
        f = frames[r["frame_idx"]]
        assert r["sum_v"] == int(f[:, :, 0].astype(np.int64).sum())
        assert r["thumb_bytes"] == len(c.build_ppm(c.resize_nearest(f, 4, 3)))


def test_pdf_thumbnail_nn_content_matches_numpy():
    """K12 residue: the PDF→raster→thumbnail loop's resample content
    (not just geometry) matches a direct numpy nearest-neighbor
    reference on the rendered page."""
    import numpy as np

    from gamechanger_data_ray.pipelines.analysis_queries import _thumb_dims
    from gamechanger_data_ray.stages import codecs as cdx
    from gamechanger_data_ray.stages.glyph_ocr import render_page_ppm

    for did in (7, 123, 98765):
        text = f"DOC {did} P1."
        pdf = cdx.build_pdf([text])
        back = cdx.extract_pdf_text(pdf)[0]
        assert back == text
        img = cdx.parse_ppm(render_page_ppm(back))
        h, w = img.shape[:2]
        ow, oh = _thumb_dims(w, h)
        thumb = cdx.resize_nearest(img, ow, oh)
        ys = (np.arange(oh) * h) // oh
        xs = (np.arange(ow) * w) // ow
        ref = img[np.ix_(ys, xs)]
        assert np.array_equal(thumb, ref)
