"""Dependency-free PNG codec (encode + decode) for the multimodal tier.

The round-5 decode kernel parsed real container HEADERS (PNG IHDR /
JPEG SOFn / GIF LSD) but documented codec decompression as the one
remaining swap point. This module closes that gap for PNG with the
stdlib only: ``zlib`` inflates the IDAT stream and numpy unfilters the
scanlines — the full spec pipeline for 8-bit greyscale (color type 0)
and truecolor (color type 2), the shapes a training-data pipeline
actually mines. Interlaced (Adam7), paletted, and 16-bit images raise
``ValueError`` — rejected explicitly, never guessed.

Reference parity note: the reference engine (ajithj/xml-hive) has no
multimodal tier at all; this is part of the beyond-reference
LLM-pipeline surface (BASELINE.md north_star).

Spec: the public PNG specification (RFC 2083 / ISO 15948) — chunk
layout, CRC-32 over type+data, and the five scanline filters
None/Sub/Up/Average/Paeth with the Paeth tie-break order a,b,c.

The encoder can apply a deterministic per-scanline filter CYCLE
(0,1,2,3,4,0,...), which makes the round-trip test a real oracle: the
decoder must implement every filter correctly to reproduce the input
pixels, and encoder/decoder share only the spec, not code paths.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def png_encode(pixels, filter_cycle: bool = True) -> bytes:
    """Serialize a (h, w) greyscale or (h, w, 3) RGB uint8 array as a
    spec-compliant PNG. ``filter_cycle`` rotates the scanline filter
    through 0..4 (else all-0) — every filter is exercised on any image
    taller than four rows."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    else:
        raise ValueError(f"unsupported pixel shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    bpp = ch  # 8-bit samples
    flat = a.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        row = flat[y]
        f = (y % 5) if filter_cycle else 0
        left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]])
        pleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            filt = row - left
        elif f == 2:  # Up
            filt = row - prev
        elif f == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - pleft
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - pleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, pleft)
            )
            filt = row - pred
        out.append(f)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(payload: bytes):
    """Decode a PNG to a (h, w) or (h, w, 3) uint8 numpy array.

    Full pipeline: chunk walk with CRC-32 verification, IDAT
    concatenation + zlib inflate, per-scanline unfilter. Filters
    None/Up/Sub unfilter vectorized (Sub is a per-lane modular prefix
    sum); Average/Paeth carry a true per-pixel data dependency and run
    as a per-scanline Python loop — exactness over throughput for the
    two rare filters (encoders overwhelmingly emit 0-2 for synthetic
    content).

    Raises ``ValueError`` on bad signature/CRC/structure and on
    unsupported shapes (interlace, palette, non-8-bit)."""
    import numpy as np

    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (0, 2) or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG shape (depth={depth} color={color})"
        )
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = 1 if color == 0 else 3
    bpp = ch
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("IDAT size does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (1 + stride) + 1
        )
        if f == 0:
            rec = line.copy()
        elif f == 2:  # Up: whole-row modular add
            rec = line + prev  # uint8 wraps mod 256
        elif f == 1:  # Sub: per-lane modular prefix sum
            rec = (
                line.reshape(-1, bpp).astype(np.int64).cumsum(0) % 256
            ).astype(np.uint8).reshape(-1)
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) % 256
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (line[x] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad filter byte {f} on row {y}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
