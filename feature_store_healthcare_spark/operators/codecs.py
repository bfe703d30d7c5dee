"""Built-in image codecs: pure stdlib+numpy PNG and BMP encode/decode.

Why this exists (round-11 VERDICT "What's missing" #3): the multimodal
decode kernels (operators/multimodal.py, OP-52) previously had a REAL
path that raised ``NotImplementedError`` without Pillow — which this
container does not have — so only the byte-stat stub had ever executed.
PNG (RFC 2083 / ISO 15948) and BMP (BITMAPINFOHEADER) are fully public
formats decodable with nothing beyond ``zlib``/``struct``/``binascii``
(all stdlib) and numpy, so the decode path can be real here:

- **BMP**: 24-bit uncompressed BI_RGB — 14-byte file header + 40-byte
  info header, bottom-up BGR scanlines padded to 4 bytes.
- **PNG**: 8-bit greyscale / RGB / RGBA, all five scanline filters
  (None/Sub/Up/Average/Paeth), single IDAT stream, no interlacing.
- **WAV**: 16-bit uncompressed PCM, any channel count, RIFF chunk walk
  (round 12b — the audio kind gets the same real-decode treatment).
- **Y4M (YUV4MPEG2)**: uncompressed video — plain-text stream header
  (W/H/frame-rate/C420jpeg params) + per-frame ``FRAME\\n`` markers over
  raw planar YUV 4:2:0 or 4:4:4 (round 12c — the video kind completes
  the set; https://wiki.multimedia.cx/index.php/YUV4MPEG2).

These are deliberately *minimal profiles* of each format — enough to
round-trip the engine's own encoded payloads and any standard-writer
file within the profile — not a general-purpose imaging library.  Out-
of-profile inputs (palette PNGs, interlaced PNGs, RLE BMPs, 16-bit
channels) raise ``ValueError`` with the exact unsupported field named;
callers that need full codec coverage fall back to Pillow when it is
importable (see :func:`decode_image`).

Everything here is driver/executor-agnostic pure Python over ``bytes``
— the Spark integration (Arrow batching, partitioning, schema) lives in
operators/multimodal.py, which calls these per payload inside
``mapInPandas`` kernels.

Reference parity: the reference repo has NO media decoding (its only
media-adjacent surface is the EMBEDDING value type,
feature_registry.py:42); this module is part of the ★ multimodal
extension family (SURVEY.md §2.11).
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"

#: PNG color type → channel count, for the 8-bit profile we support
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP.

    Scanlines are written bottom-up in BGR order, each padded to a
    4-byte multiple — the canonical positive-height layout.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_bmp expects (H, W, 3) uint8, got {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    # bottom-up + BGR: flip rows, reverse the channel axis
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row_bytes] = arr[::-1, :, ::-1].reshape(h, row_bytes)
    pixel_data = body.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    header = struct.pack(
        "<2sIHHI", BMP_MAGIC, 14 + 40 + len(pixel_data), 0, 0, 14 + 40
    )
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BI_RGB BMP to an (H, W, 3) uint8 RGB
    array.  Handles both bottom-up (positive height) and top-down
    (negative height) layouts and the 4-byte row padding."""
    if len(payload) < 54 or payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP profile: bpp={bpp} compression={compression} "
            "(only 24-bit BI_RGB)"
        )
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    need = data_offset + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(payload)}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage → flip to top-down
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


# ---------------------------------------------------------------------------
# PNG (8-bit grey / RGB / RGBA, filters 0-4, no interlace)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", binascii.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_scanline(ftype: int, raw: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one raw scanline (encoder side).
    ``raw``/``prior`` are int32 copies so the mod-256 arithmetic is explicit."""
    left = np.concatenate([np.zeros(bpp, np.int32), raw[:-bpp]])
    up_left = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
    if ftype == 0:
        return raw
    if ftype == 1:
        return (raw - left) % 256
    if ftype == 2:
        return (raw - prior) % 256
    if ftype == 3:
        return (raw - (left + prior) // 2) % 256
    if ftype == 4:
        return (raw - _paeth(left, prior, up_left)) % 256
    raise ValueError(f"unknown PNG filter type {ftype}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array as an 8-bit PNG: (H, W) → greyscale,
    (H, W, 3) → RGB, (H, W, 4) → RGBA.  ``filter_type`` (0-4) applies
    one filter to every scanline — encoders may mix per-row, the same
    decoder handles both; exposing it lets tests exercise every
    unfilter branch with real streams."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4):
        raise ValueError(f"encode_png expects (H, W[, 1|3|4]) uint8, got {arr.shape}")
    h, w, ch = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = arr.reshape(h, w * ch).astype(np.int32)
    lines = []
    prior = np.zeros(w * ch, np.int32)
    for y in range(h):
        filtered = _filter_scanline(filter_type, flat[y], prior, ch)
        lines.append(bytes([filter_type]) + filtered.astype(np.uint8).tobytes())
        prior = flat[y]
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced greyscale/RGB/RGBA PNG to an
    (H, W, channels) uint8 array (greyscale keeps an explicit 1-wide
    channel axis).  Unfilters all five standard per-scanline filter
    types; multiple IDAT chunks are concatenated per the spec."""
    if len(payload) < 8 or payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload (missing signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        length, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG profile: bit depth {depth}, color type "
            f"{color_type} (only 8-bit grey/RGB/RGBA)"
        )
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG profile: compression={comp} filter={filt} "
            f"interlace={interlace}"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"PNG data length {len(raw)} != expected {(stride + 1) * h}"
        )
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        ftype, line = int(raw[y, 0]), raw[y, 1:].astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:
            rec = (line + prior) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters are sequential within the row
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = prior[x]
                up_left = prior[x - ch] if x >= ch else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - up_left
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - up_left)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else up_left)
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
        out[y] = rec
        prior = rec
    return out.astype(np.uint8).reshape(h, w, ch)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM, 16-bit)
# ---------------------------------------------------------------------------

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 array as a PCM WAV: (N,) → mono, (N, C) →
    C-channel interleaved.  Canonical 44-byte RIFF/fmt/data layout."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"encode_wav expects (N[, C]) int16, got {samples.shape}")
    n, ch = samples.shape
    data = samples.tobytes()  # interleaved little-endian
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV to ``((N, channels) int16, sample_rate)``.
    Walks the RIFF chunk list (so extra chunks like LIST/fact are
    skipped per the spec); only uncompressed PCM16 is in profile."""
    if len(payload) < 44 or payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE header)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag, length = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, ch, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV profile: format={audio_format} bits={bits} "
            "(only uncompressed PCM16)"
        )
    n = len(data) // (ch * 2)
    arr = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return np.ascontiguousarray(arr), sample_rate


# ---------------------------------------------------------------------------
# Y4M / YUV4MPEG2 (uncompressed planar video)
# ---------------------------------------------------------------------------

Y4M_MAGIC = b"YUV4MPEG2"

#: colourspace tag → (plane-size divisors relative to luma) for the two
#: profiles we support: 4:2:0 (chroma quarter-size) and 4:4:4 (full-size)
_Y4M_CHROMA = {"420jpeg": 4, "420": 4, "444": 1}


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), chroma: str = "420jpeg"
) -> bytes:
    """Encode a (T, H, W) uint8 LUMA volume as a Y4M stream with flat
    128-valued (neutral-grey) chroma planes.  The engine's per-frame
    statistics are luma-only, so synthesized fixtures carry their signal
    in Y; the chroma planes still round-trip byte-exactly.  4:2:0
    requires even W and H (chroma is quarter-size)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"encode_y4m expects (T, H, W) uint8 luma, got {frames.shape}")
    t, h, w = frames.shape
    div = _Y4M_CHROMA[chroma]
    if div == 4 and (h % 2 or w % 2):
        raise ValueError(f"4:2:0 needs even dims, got {w}x{h}")
    chroma_plane = np.full((h * w) // div, 128, dtype=np.uint8).tobytes()
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n".encode()
    parts = [header]
    for i in range(t):
        parts.append(b"FRAME\n")
        parts.append(frames[i].tobytes())
        parts.append(chroma_plane)
        parts.append(chroma_plane)
    return b"".join(parts)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a Y4M stream to ``((T, H, W) uint8 luma, (fps_num, fps_den))``
    — chroma planes are parsed (stream position must walk them) but only
    luma is returned, matching the engine's per-frame statistics.
    Per-frame parameter strings after ``FRAME`` are tolerated."""
    if not payload.startswith(Y4M_MAGIC + b" "):
        raise ValueError("not a Y4M payload (missing YUV4MPEG2 magic)")
    nl = payload.index(b"\n")
    params = payload[len(Y4M_MAGIC) + 1 : nl].decode("ascii").split()
    w = h = None
    fps = (25, 1)
    chroma = "420jpeg"
    for p in params:
        if p[0] == "W":
            w = int(p[1:])
        elif p[0] == "H":
            h = int(p[1:])
        elif p[0] == "F":
            num, den = p[1:].split(":")
            fps = (int(num), int(den))
        elif p[0] == "C":
            chroma = p[1:]
    if w is None or h is None:
        raise ValueError("Y4M header missing W or H")
    if chroma not in _Y4M_CHROMA:
        raise ValueError(f"unsupported Y4M colourspace C{chroma} (only 420/444)")
    luma_size = w * h
    frame_size = luma_size + 2 * (luma_size // _Y4M_CHROMA[chroma])
    pos, frames = nl + 1, []
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError(f"expected FRAME marker at offset {pos}")
        pos = payload.index(b"\n", pos) + 1  # frame params tolerated
        if pos + frame_size > len(payload):
            raise ValueError("truncated Y4M frame")
        luma = np.frombuffer(payload, dtype=np.uint8, count=luma_size, offset=pos)
        frames.append(luma.reshape(h, w))
        pos += frame_size
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return np.stack(frames), fps


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    """'png' / 'bmp' / 'wav' / 'y4m' from magic bytes, else None."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == BMP_MAGIC:
        return "bmp"
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == Y4M_MAGIC:
        return "y4m"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """Decode any supported payload to (H, W, channels) uint8: built-in
    PNG/BMP decoders first (always available), Pillow for everything
    else when importable — otherwise ``NotImplementedError`` naming the
    sniffed format, so the capability boundary is explicit."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "payload is neither PNG nor BMP (the built-in codecs) and "
            "Pillow is not installed for other formats"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(payload)))


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — deterministic,
    pure-index arithmetic (the PIL ``NEAREST`` analog): output pixel
    (y, x) samples input (floor(y·H/height), floor(x·W/width))."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return np.ascontiguousarray(arr[ys][:, xs])
