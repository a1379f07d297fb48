"""Real pure-Python media codecs — no external libraries.

These make the multimodal plumbing non-stub for two embeddable formats:

- **PDF text extraction** (reference parity:
  ``common/document_parser/lib/pdf_reader.py:7-14`` opens the binary doc
  with PyMuPDF; ``lib/pages.py:26-33`` walks pages extracting text). Here
  the extractor is a from-scratch parser for PDFs whose content streams
  are uncompressed or FlateDecode-compressed (zlib is stdlib) — it walks
  ``obj … stream … endstream`` blocks, inflates, and evaluates the text
  operators (``Tj``, ``'``, ``"``, ``TJ``) with full literal-string
  escape and hex-string handling. ``build_pdf`` writes a well-formed
  single-font PDF (xref table and all) used to synthesize deterministic
  test corpora — extraction round-trips it byte-exactly.

- **PPM/PGM image decode + resize** (reference parity:
  ``dataPipelines/gc_thumbnails/utils.py:38-47`` renders page-1 thumbnails
  via PyMuPDF's pixmap). Netpbm is the classic library-free raster
  format: ``parse_ppm`` reads P6/P5 binary and P3/P2 ASCII variants
  (with header comments), ``resize_nearest`` is a real nearest-neighbor
  resample, ``build_ppm`` re-encodes — a genuine decode → transform →
  encode thumbnail path with zero dependencies.

All functions are pure (bytes/numpy in, bytes/numpy out) so the Ray
stages in :mod:`.multimodal` stay thin actor-pool wrappers.
"""

from __future__ import annotations

import re
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# PDF — build
# ---------------------------------------------------------------------------

_PDF_ESCAPES = {"\\": "\\\\", "(": "\\(", ")": "\\)", "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _escape_pdf_string(s: str) -> str:
    return "".join(_PDF_ESCAPES.get(c, c) for c in s)


def build_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Write a minimal well-formed PDF: one Helvetica ``Tj`` per text line,
    one content stream per page, correct xref offsets. Text must be
    latin-1-encodable (the builder is a test-corpus synthesizer, not a
    full writer)."""
    objects: list[bytes] = []  # 1-indexed by position+1

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    # (4+2i) page dict, (5+2i) content stream
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{oid} 0 R" for oid in page_obj_ids)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode("latin-1")
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    for i, text in enumerate(pages):
        content_id = 5 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_id} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode("latin-1")
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td", "14 TL"]
        for j, line in enumerate(text.split("\n")):
            if j:
                ops.append("T*")
            ops.append(f"({_escape_pdf_string(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b" /Filter /FlateDecode"
        objects.append(
            b"<< /Length " + str(len(stream)).encode() + filt + b" >>\n"
            b"stream\n" + stream + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free head
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# PDF — extract
# ---------------------------------------------------------------------------

_STREAM_HEAD_RE = re.compile(
    rb"<<(?P<dict>(?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*)>>\s*stream\r?\n",
    re.DOTALL,
)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+0\s+R)")
_ENDSTREAM_RE = re.compile(rb"(?:\r?\n)?endstream")

_OCTAL_RE = re.compile(r"\\([0-7]{1,3})")
_UNESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
              "(": "(", ")": ")", "\\": "\\"}


def _unescape_pdf_string(body: str) -> str:
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = body[i + 1]
        if nxt in _UNESCAPES:
            out.append(_UNESCAPES[nxt])
            i += 2
        elif (m := _OCTAL_RE.match(body, i)) is not None:
            out.append(chr(int(m.group(1), 8)))
            i = m.end()
        elif nxt == "\n":  # line continuation
            i += 2
        else:
            out.append(nxt)
            i += 2
    return "".join(out)


def _tokenize_content(data: str):
    """Yield ('str', text) for string objects and ('op', name) for
    operators from a decoded content stream."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == "(":
            depth, j, buf = 1, i + 1, []
            while j < n and depth:
                ch = data[j]
                if ch == "\\" and j + 1 < n:
                    buf.append(data[j : j + 2])
                    j += 2
                    continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if not depth:
                        break
                buf.append(ch)
                j += 1
            yield ("str", _unescape_pdf_string("".join(buf)))
            i = j + 1
        elif c == "<" and i + 1 < n and data[i + 1] != "<":
            j = data.find(">", i)
            if j < 0:
                break
            hx = re.sub(r"\s", "", data[i + 1 : j])
            if len(hx) % 2:
                hx += "0"
            try:
                yield ("str", bytes.fromhex(hx).decode("latin-1"))
            except ValueError:
                pass
            i = j + 1
        elif c == "<":  # '<<' dict — skip
            i += 2
        elif c.isalpha() or c in "'\"*":
            j = i
            while j < n and (data[j].isalpha() or data[j] in "'\"*"):
                j += 1
            yield ("op", data[i:j])
            i = j
        else:
            i += 1


def _stream_dict_filters(d: bytes) -> list[bytes]:
    m = re.search(rb"/Filter\s*(\[(?P<arr>[^\]]*)\]|/(?P<one>\w+))", d)
    if not m:
        return []
    if m.group("arr") is not None:
        return re.findall(rb"/(\w+)", m.group("arr"))
    return [m.group("one")]


def extract_pdf_text(payload: bytes) -> list[str]:
    """Extract per-content-stream text from an uncompressed or
    FlateDecode PDF. Returns one string per text-bearing stream (≈ one
    per page for builder-shaped PDFs); text runs separated by the
    line-advance operators (``T*``, ``Td``, ``TD``, ``'``, ``\"``) come
    back newline-joined. Streams with unsupported filters are skipped —
    never an exception — so a mixed corpus degrades gracefully."""
    pages: list[str] = []
    for m in _STREAM_HEAD_RE.finditer(payload):
        filters = _stream_dict_filters(m.group("dict"))
        start = m.end()
        # /Length slices the stream exactly (a trailing 0x0D data byte is
        # indistinguishable from the EOL before 'endstream' otherwise);
        # indirect-reference lengths (N 0 R) fall back to the scan
        lm = _LENGTH_RE.search(m.group("dict"))
        if lm:
            data = payload[start : start + int(lm.group(1))]
        else:
            em = _ENDSTREAM_RE.search(payload, start)
            if em is None:
                continue
            data = payload[start : em.start()]
        if filters == [b"FlateDecode"]:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        elif filters:
            continue  # unsupported filter (DCT, LZW, …): skip, don't fail
        try:
            text = data.decode("latin-1")
        except Exception:  # pragma: no cover - latin-1 decodes all bytes
            continue
        if "BT" not in text:
            continue
        lines: list[list[str]] = [[]]
        in_text, pending = False, None
        for kind, val in _tokenize_content(text):
            if kind == "str":
                pending = val if pending is None else pending + val
                continue
            op = val
            if op == "BT":
                in_text = True
            elif op == "ET":
                in_text = False
            elif in_text and op in ("Tj", "TJ") and pending is not None:
                lines[-1].append(pending)
            elif in_text and op in ("T*", "Td", "TD"):
                if lines[-1]:
                    lines.append([])
            elif in_text and op in ("'", '"'):
                if lines[-1]:
                    lines.append([])
                if pending is not None:
                    lines[-1].append(pending)
            pending = None
        # every text-bearing stream (it had a BT block) contributes a
        # page — including an EMPTY one: dropping blank pages would
        # silently renumber page_idx for everything after them
        pages.append("\n".join("".join(seg) for seg in lines if seg))
    return pages


# ---------------------------------------------------------------------------
# PPM / PGM (Netpbm)
# ---------------------------------------------------------------------------

def build_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def _pnm_header(payload: bytes):
    """Parse magic + dimensions + maxval, skipping '#' comments. Returns
    (magic, w, h, maxval, data_offset)."""
    if payload[:1] != b"P" or payload[1:2] not in b"2356":
        raise ValueError("not a supported PNM payload")
    magic = payload[:2].decode()
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.find(b"\n", i)
            if i < 0:
                raise ValueError("truncated PNM header")
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    if len(fields) < 3:
        raise ValueError("truncated PNM header")
    return magic, fields[0], fields[1], fields[2], i + 1  # skip 1 ws byte


def parse_ppm(payload: bytes) -> np.ndarray:
    """Decode P6/P5 (binary) and P3/P2 (ASCII) Netpbm payloads to an
    (h, w, 3) uint8 array (grayscale replicated to 3 channels).
    Two-byte-sample files (maxval > 255) are rejected explicitly — a
    silent one-byte read would emit garbage pixels without an error."""
    magic, w, h, maxval, off = _pnm_header(payload)
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PNM maxval {maxval} (1-255 only)")
    channels = 3 if magic in ("P3", "P6") else 1
    count = w * h * channels
    if magic in ("P5", "P6"):
        raw = np.frombuffer(payload, dtype=np.uint8, count=count, offset=off)
    else:
        raw = np.array(payload[off - 1 :].split()[:count], dtype=np.int64)
    img = (raw.astype(np.float64) * (255.0 / maxval)).round().astype(np.uint8)
    img = img.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real nearest-neighbor resample (the thumbnail transform)."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[rows[:, None], cols[None, :]]


# ---------------------------------------------------------------------------
# WAV — RIFF/WAVE PCM encode + decode (the audio analog of the PPM path)
# ---------------------------------------------------------------------------

def build_wav(samples: np.ndarray, sample_rate: int = 16000,
              bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] (shape (n,) mono or (n, ch)) as a
    canonical RIFF/WAVE PCM file (format tag 1, 8- or 16-bit). Public
    spec; used to synthesize deterministic audio test corpora the way
    ``build_pdf``/``build_ppm`` do for documents and images."""
    import struct

    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    s = np.clip(s, -1.0, 1.0)
    if bits == 16:
        raw = np.round(s * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        raw = (np.round(s * 127.0) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits} (8/16 only)")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block, block, bits)
    data_len = len(raw)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_len)
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_len) + raw)


def parse_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE PCM payload → (sample_rate, float64 samples in
    [-1, 1], shape (n, channels)). Walks the chunk list (tolerating extra
    chunks like LIST/fact before data), PCM 8/16-bit only — anything else
    raises rather than guessing."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    fmt = None
    data = None
    while off + 8 <= len(payload):
        cid = payload[off:off + 4]
        (clen,) = struct.unpack("<I", payload[off + 4:off + 8])
        body = payload[off + 8:off + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _byte_rate, _block, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1:
        raise ValueError(f"unsupported WAVE format tag {tag} (PCM only)")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        s = raw.astype(np.float64) / 32767.0
    elif bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8)
        s = (raw.astype(np.float64) - 128.0) / 127.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits} (8/16 only)")
    if ch < 1:
        raise ValueError("zero channels")
    n = len(s) // ch
    return int(rate), s[: n * ch].reshape(n, ch)


# ---------------------------------------------------------------------------
# GIF — animated GIF87a/89a encode + decode (the video-analog container:
# a REAL compressed multi-frame format, so the decode → frame-sample →
# resize pipeline runs on genuine LZW decompression, not a stub)
# ---------------------------------------------------------------------------
#
# Subset (documented): global grayscale-capable color table, full frames
# at (0,0) with no local color tables, no transparency/disposal
# composition, non-interlaced encode (the parser handles interlaced
# frames too). LZW is the standard GIF variant: LSB-first bit packing,
# variable code width 3..12 bits, CLEAR/EOI codes, table reset at 4096.


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    code_size = min_code + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    out_bits.append((clear, code_size))
    it = iter(int(v) for v in indices)
    cur = next(it)
    for k in it:
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        out_bits.append((cur, code_size))
        table[(cur, k)] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
        elif next_code > 4095:
            out_bits.append((clear, code_size))
            table.clear()
            code_size = min_code + 1
            next_code = eoi + 1
        cur = k
    out_bits.append((cur, code_size))
    out_bits.append((eoi, code_size))
    # LSB-first bit pack
    acc = n = 0
    by = bytearray()
    for code, width in out_bits:
        acc |= code << n
        n += width
        while n >= 8:
            by.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        by.append(acc & 0xFF)
    return bytes(by)


def _lzw_decode(data: bytes, min_code: int) -> np.ndarray:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    pos = 0  # bit cursor
    total = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total:
            raise ValueError("LZW stream truncated")
        byte0 = pos // 8
        acc = int.from_bytes(data[byte0:byte0 + (pos % 8 + width + 7) // 8 + 1],
                             "little")
        v = (acc >> (pos % 8)) & ((1 << width) - 1)
        pos += width
        return v

    literals = [bytes([c]) for c in range(1 << min_code)]
    table: list[bytes] = []
    code_size = min_code + 1
    prev: bytes | None = None
    out = bytearray()
    while True:
        code = read(code_size)
        if code == clear:
            table = list(literals) + [b"", b""]  # clear/eoi placeholders
            code_size = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        prev = entry
    return np.frombuffer(bytes(out), dtype=np.uint8)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def build_gif(frames: list[np.ndarray]) -> bytes:
    """Encode full-frame RGB arrays (identical shapes, ≤256 distinct
    colors across ALL frames) as an animated GIF89a. Deterministic:
    palette is the sorted distinct colors; used to synthesize test/bench
    corpora like ``build_pdf``/``build_ppm``/``build_wav``."""
    import struct

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    stack = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
    flat = stack.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors (>256)")
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    gct = np.zeros((1 << bits, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x70 | (bits - 1), 0, 0])
    out += gct.tobytes()
    min_code = max(2, bits)
    idx_frames = inverse.reshape(len(frames), h * w)
    for fi in range(len(frames)):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        stream = _lzw_encode(idx_frames[fi], min_code)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def parse_gif(payload: bytes) -> list[np.ndarray]:
    """Decode an animated GIF → list of full-frame RGB uint8 arrays.
    Handles 87a/89a headers, extensions (skipped), local color tables,
    interlaced frames; refuses partial-canvas frames (no composition in
    this subset — the encoder above never writes them)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", payload[6:10])
    packed, _bg, _aspect = payload[10], payload[11], payload[12]
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, off).reshape(n, 3)
        off += n * 3
    frames: list[np.ndarray] = []
    while off < len(payload):
        block = payload[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            off += 1
            while payload[off]:
                off += 1 + payload[off]
            off += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", payload[off:off + 8])
        fpacked = payload[off + 8]
        off += 9
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError("partial-canvas frames unsupported (subset)")
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, off).reshape(n, 3)
            off += n * 3
        if ct is None:
            raise ValueError("frame has no color table")
        min_code = payload[off]
        off += 1
        stream = bytearray()
        while payload[off]:
            ln = payload[off]
            stream += payload[off + 1:off + 1 + ln]
            off += 1 + ln
        off += 1
        idx = _lzw_decode(bytes(stream), min_code)
        if len(idx) < fw * fh:
            raise ValueError("LZW stream shorter than frame")
        idx = idx[: fw * fh]
        if fpacked & 0x40:  # interlaced: reorder rows per the 4-pass scheme
            rows = np.empty(fh, dtype=np.int64)
            srcs = np.concatenate(
                [np.arange(start, fh, step) for start, step in _GIF_INTERLACE])
            rows[srcs] = np.arange(fh)
            idx = idx.reshape(fh, fw)[rows].reshape(-1)
        frames.append(ct[idx].reshape(fh, fw, 3))
    return frames
