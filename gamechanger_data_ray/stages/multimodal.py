"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / frame-sample as actor-pool stages.

Reference parity: raw PDF binary handling + thumbnail rendering
(``dataPipelines/gc_thumbnails/utils.py:31-47`` renders page 1 → PNG in a
process pool; ``common/document_parser/lib/pdf_reader.py:7-14`` opens the
binary doc). The Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested, and two formats now have
REAL pure-Python codecs (:mod:`.codecs`): PDF text extraction
(:class:`PdfTextExtractor`, uncompressed + FlateDecode streams) and
PPM/PGM image decode/resize (:class:`PpmDecoder`,
:class:`PpmThumbnailer`). ``FakeDecoder`` remains the clearly-marked
deterministic FALLBACK for formats whose codecs need absent libraries
(JPEG, MP4, …) — :func:`decoder_for` dispatches by mime.

Design notes for 100 TB: binary rows are wide → small ``batch_size`` (e.g.
16–64) and a dedicated actor pool with ``num_cpus=1`` per actor so decode
does not starve the readers; outputs carry only features/metadata, never
re-emit the payload.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from . import codecs


MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),  # opaque encoded bytes
        pa.field("mime", pa.string()),
        pa.field("n_bytes", pa.int64()),
    ]
)


def to_media_table(ids, payloads: list[bytes], mime: str) -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([mime] * len(payloads)),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class Decoder:
    """Actor-pool decode stage base. Subclass and implement ``decode_one``.

    __init__ is the once-per-actor codec setup hook (load codecs/models);
    __call__ decodes a batch and emits features only (payload dropped)."""

    feature_dim = 8

    def __init__(self):
        self.setup()

    def setup(self) -> None:  # codec init hook
        pass

    def decode_one(self, payload: bytes, mime: str) -> np.ndarray:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not available in this "
            "environment; use FakeDecoder for plumbing tests"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.vstack(
            [
                self.decode_one(p.as_py(), m.as_py())
                for p, m in zip(batch["payload"], batch["mime"])
            ]
        )
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": batch["n_bytes"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), self.feature_dim
                ),
            }
        )


class FakeDecoder(Decoder):
    """STUB codec — deterministic byte-statistics 'features' standing in for
    a real image/audio decode. Keeps the distributed plumbing honest."""

    def decode_one(self, payload: bytes, mime: str) -> np.ndarray:
        b = np.frombuffer(payload, dtype=np.uint8)
        if len(b) == 0:
            return np.zeros(self.feature_dim, dtype=np.float32)
        digest = hashlib.sha256(payload).digest()
        return np.array(
            [
                float(len(b)),
                float(b.mean()),
                float(b.std()),
                float(b.min()),
                float(b.max()),
                float(int.from_bytes(digest[:4], "little") % 1000) / 1000.0,
                float(b[: len(b) // 2].mean()),
                float(b[len(b) // 2 :].mean()),
            ],
            dtype=np.float32,
        )


class PpmDecoder(Decoder):
    """REAL image decode: Netpbm (P6/P5/P3/P2) → 8 genuine image features
    (dims, per-channel means, luma spread) via :func:`codecs.parse_ppm`."""

    def decode_one(self, payload: bytes, mime: str) -> np.ndarray:
        img = codecs.parse_ppm(payload)
        h, w = img.shape[:2]
        f = img.astype(np.float64)
        luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        return np.array(
            [
                float(w),
                float(h),
                float(f[:, :, 0].mean()),
                float(f[:, :, 1].mean()),
                float(f[:, :, 2].mean()),
                float(luma.std()),
                float(luma.min()),
                float(luma.max()),
            ],
            dtype=np.float32,
        )


class PdfTextExtractor:
    """REAL PDF → per-page text, flat_map-shaped (input row → ≥0 page
    rows), the reference's ``pages.py:26-33`` walk. Actor-pool stage:
    regexes/codec state live in the codecs module; payloads never
    re-emitted. Non-PDF or undecodable payloads yield zero rows (the
    dead-letter filter upstream handles genuinely bad docs)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idx, texts = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                pages = codecs.extract_pdf_text(payload)
            except Exception:
                pages = []
            for i, text in enumerate(pages):
                ids.append(mid)
                idx.append(i)
                texts.append(text)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "page_idx": pa.array(idx, pa.int32()),
                "page_text": pa.array(texts, pa.string()),
            }
        )


class GifFrameSampler:
    """REAL video-analog stage: decode an animated GIF (true LZW
    decompression, :func:`codecs.parse_gif`), keep every ``every_k``-th
    frame, nearest-resize each kept frame to a thumbnail — the
    decode → frame-sample → resize chain of a video pipeline, flat_map
    shaped (one input row → one row per SAMPLED frame) with exact
    integer pixel sums a SQL oracle can recompute. Payloads are decoded
    once and never re-emitted."""

    def __init__(self, every_k: int = 2, thumb_w: int = 4, thumb_h: int = 3):
        self.every_k = every_k
        self.thumb_w = thumb_w
        self.thumb_h = thumb_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, nfs, sums, tbytes = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            frames = codecs.parse_gif(payload)
            for f in range(0, len(frames), self.every_k):
                thumb = codecs.resize_nearest(
                    frames[f], self.thumb_w, self.thumb_h)
                ids.append(mid)
                fidx.append(f)
                nfs.append(len(frames))
                sums.append(int(frames[f][:, :, 0].astype(np.int64).sum()))
                tbytes.append(len(codecs.build_ppm(thumb)))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "frame_idx": pa.array(fidx, pa.int64()),
             "n_frames": pa.array(nfs, pa.int64()),
             "sum_v": pa.array(sums, pa.int64()),
             "thumb_bytes": pa.array(tbytes, pa.int64())}
        )


class WavDecoder(Decoder):
    """REAL audio decode: RIFF/WAVE PCM → 8 genuine signal features
    (duration, rate, channels, RMS, peak, zero-crossing rate, DC mean,
    std) via :func:`codecs.parse_wav` — the audio analog of
    :class:`PpmDecoder`, all vectorized numpy over the sample array."""

    def decode_one(self, payload: bytes, mime: str) -> np.ndarray:
        rate, s = codecs.parse_wav(payload)
        mono = s.mean(axis=1)
        n = len(mono)
        zcr = (
            float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            / (n - 1)
        ) if n > 1 else 0.0
        return np.array(
            [
                float(n) / rate,                       # duration seconds
                float(rate),
                float(s.shape[1]),                     # channels
                float(np.sqrt(np.mean(mono**2))) if n else 0.0,  # RMS
                float(np.abs(mono).max()) if n else 0.0,          # peak
                zcr,
                float(mono.mean()) if n else 0.0,      # DC offset
                float(mono.std()) if n else 0.0,
            ],
            dtype=np.float32,
        )


# mime → Decoder class; FakeDecoder is the explicit fallback for formats
# whose real codecs need libraries absent here (PIL/ffmpeg)
DECODERS: dict[str, type] = {
    "image/x-portable-pixmap": PpmDecoder,
    "image/x-portable-graymap": PpmDecoder,
    "audio/wav": WavDecoder,
    "audio/x-wav": WavDecoder,
}


def decoder_for(mime: str) -> type:
    return DECODERS.get(mime, FakeDecoder)


class FrameSampler:
    """Frame-sampling plumbing: emit one row per sampled 'frame' offset
    (every ``stride`` bytes stands in for every Nth video frame).
    flat_map-shaped: input row → ≤ max_frames output rows."""

    def __init__(self, stride: int = 1000, max_frames: int = 8):
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, offsets = [], [], []
        for mid, nb in zip(
            batch["media_id"].to_pylist(), batch["n_bytes"].to_pylist()
        ):
            n = min(self.max_frames, max(1, nb // self.stride))
            for i in range(n):
                ids.append(mid)
                frame_idx.append(i)
                offsets.append(i * self.stride)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "byte_offset": pa.array(offsets, pa.int64()),
            }
        )


class Resizer:
    """Resize/transcode plumbing: binary payload in → smaller binary
    payload out with updated size metadata. Unlike :class:`Decoder`, the
    product IS a new media object, so the payload is re-emitted — which is
    why resize stages need small batches and their own pool at scale.

    STUB codec: deterministic byte-decimation (keep every ceil(n/target)th
    byte) stands in for a real image resample; a deployment overrides
    ``resize_one`` with PIL/ffmpeg and everything else holds."""

    def __init__(self, target_bytes: int = 256):
        self.target = target_bytes

    def resize_one(self, payload: bytes) -> bytes:
        n = len(payload)
        if n <= self.target:
            return payload
        step = -(-n // self.target)  # ceil
        return payload[::step]

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = [self.resize_one(p.as_py()) for p in batch["payload"]]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(resized, pa.binary()),
                "mime": batch["mime"],
                "n_bytes": pa.array([len(p) for p in resized], pa.int64()),
                "orig_bytes": batch["n_bytes"],
            }
        )


class PpmThumbnailer(Resizer):
    """REAL thumbnail path for Netpbm images: decode → nearest-neighbor
    resample to fit ``max_side`` → re-encode P6 (the reference's
    ``gc_thumbnails/utils.py:38-47`` pixmap-scale-save, without PyMuPDF).
    Inherits the Resizer plumbing (payload re-emitted, small batches)."""

    def __init__(self, max_side: int = 16):
        self.max_side = max_side

    def resize_one(self, payload: bytes) -> bytes:
        img = codecs.parse_ppm(payload)
        h, w = img.shape[:2]
        scale = max(h, w) / float(self.max_side)
        if scale <= 1.0:
            return codecs.build_ppm(img)
        out_w = max(1, int(round(w / scale)))
        out_h = max(1, int(round(h / scale)))
        return codecs.build_ppm(codecs.resize_nearest(img, out_w, out_h))
