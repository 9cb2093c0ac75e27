"""PNG codec exactness: the encoder and decoder share only the spec
(RFC 2083), so a filter-cycling round-trip is a real oracle — every
scanline filter must be implemented correctly on both sides to
reproduce the pixels. A hand-assembled PNG (built byte-by-byte here,
not by the encoder) pins the decoder against the spec independently."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from xml_hive_spark.operators.png import png_decode, png_encode


def _rng(seed):
    return np.random.default_rng(seed)


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1), (1, 7), (6, 1), (5, 5),
                                       (13, 31), (32, 32)])
    def test_gray(self, shape):
        px = _rng(7).integers(0, 256, shape, dtype=np.uint8)
        for cycle in (True, False):
            assert np.array_equal(png_decode(png_encode(px, cycle)), px)

    @pytest.mark.parametrize("shape", [(1, 1, 3), (5, 5, 3), (11, 17, 3)])
    def test_rgb(self, shape):
        px = _rng(11).integers(0, 256, shape, dtype=np.uint8)
        for cycle in (True, False):
            assert np.array_equal(png_decode(png_encode(px, cycle)), px)

    def test_extreme_values(self):
        # all-0 / all-255 stress the modular filter arithmetic
        for fill in (0, 255):
            px = np.full((9, 9), fill, dtype=np.uint8)
            assert np.array_equal(png_decode(png_encode(px)), px)
        # gradient exercises Average/Paeth prediction heavily
        px = np.add.outer(np.arange(20), np.arange(20)).astype(np.uint8) * 6
        assert np.array_equal(png_decode(png_encode(px)), px)

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_property(self, data):
        h = data.draw(st.integers(1, 12))
        w = data.draw(st.integers(1, 12))
        ch = data.draw(st.sampled_from([1, 3]))
        seed = data.draw(st.integers(0, 2**31))
        shape = (h, w) if ch == 1 else (h, w, ch)
        px = _rng(seed).integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(px)), px)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


class TestSpecAnchored:
    """Decoder vs a PNG assembled here from raw spec arithmetic."""

    def test_hand_built_filters(self):
        # 4x3 greyscale, one scanline per filter type 0..3, recon
        # computed by hand from the spec equations
        w, h = 3, 4
        rows = [
            (0, [10, 20, 30]),          # None  -> 10 20 30
            (1, [5, 5, 5]),             # Sub   -> 5 10 15
            (2, [1, 2, 3]),             # Up    -> 6 12 18
            (3, [4, 4, 4]),             # Avg: left, prior known
        ]
        want = np.zeros((h, w), dtype=np.uint8)
        want[0] = [10, 20, 30]
        want[1] = [5, 10, 15]
        want[2] = [6, 12, 18]
        # Avg row: r[0]=4+(0+6)//2=7; r[1]=4+(7+12)//2=13; r[2]=4+(13+18)//2=19
        want[3] = [7, 13, 19]
        raw = b"".join(bytes([f]) + bytes(line) for f, line in rows)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        assert np.array_equal(png_decode(payload), want)

    def test_paeth_row_by_hand(self):
        # 2x3: row0 None [100, 50, 25]; row1 Paeth filt [10, 10, 10]
        # recon[0]: a=0 b=100 c=0 -> p=100; pa=100 pb=0 pc=100 -> pred=b=100 -> 110
        # recon[1]: a=110 b=50 c=100 -> p=60; pa=50 pb=10 pc=40 -> pred=b=50 -> 60
        # recon[2]: a=60 b=25 c=50 -> p=35; pa=25 pb=10 pc=15 -> pred=b=25 -> 35
        raw = bytes([0, 100, 50, 25, 4, 10, 10, 10])
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        assert np.array_equal(
            png_decode(payload), np.array([[100, 50, 25], [110, 60, 35]],
                                          dtype=np.uint8)
        )

    def test_multi_idat_chunks_concatenate(self):
        px = _rng(3).integers(0, 256, (6, 6), dtype=np.uint8)
        enc = png_encode(px, filter_cycle=True)
        # split the single IDAT into two chunks at the zlib-stream level
        sig, rest = enc[:8], enc[8:]
        (ilen,) = struct.unpack(">I", rest[:4])
        ihdr_all = rest[: 12 + ilen]
        rest2 = rest[12 + ilen :]
        (dlen,) = struct.unpack(">I", rest2[:4])
        idat = rest2[8 : 8 + dlen]
        cut = len(idat) // 2
        rebuilt = (sig + ihdr_all + _chunk(b"IDAT", idat[:cut])
                   + _chunk(b"IDAT", idat[cut:]) + _chunk(b"IEND", b""))
        assert np.array_equal(png_decode(rebuilt), px)


class TestRejection:
    def _png(self):
        return png_encode(_rng(5).integers(0, 256, (4, 4), dtype=np.uint8))

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            png_decode(b"JUNK" + self._png()[4:])

    def test_crc_corruption(self):
        p = bytearray(self._png())
        p[20] ^= 0xFF  # inside IHDR data
        with pytest.raises(ValueError, match="CRC"):
            png_decode(bytes(p))

    def test_truncated(self):
        with pytest.raises(ValueError):
            png_decode(self._png()[:30])

    def test_interlace_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7
        p = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
             + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="interlaced"):
            png_decode(p)

    def test_palette_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # color 3
        p = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
             + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="unsupported"):
            png_decode(p)

    def test_size_mismatch_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        p = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
             + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="IDAT size"):
            png_decode(p)

    def test_bad_filter_byte(self):
        raw = bytes([9, 1, 2])  # filter 9 invalid
        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
        p = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(raw))
             + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="filter"):
            png_decode(p)


def test_header_parser_agrees_on_real_png():
    """The round-5 header parser must report the same dims for a fully
    real PNG as the codec that produced it."""
    from xml_hive_spark.operators.multimodal import decode_image_header

    px = _rng(17).integers(0, 256, (21, 13), dtype=np.uint8)
    meta = decode_image_header(png_encode(px))
    assert (meta["format"], meta["width"], meta["height"]) == ("png", 13, 21)


def test_pixel_planes_uses_real_codecs():
    """_pixel_planes must run the actual PNG/GIF decoders on real
    containers (and split RGB into per-channel planes), while synthetic
    make_image containers keep the raw-plane convention."""
    from xml_hive_spark.operators.gif import gif_encode
    from xml_hive_spark.operators.multimodal import (
        _pixel_planes,
        make_image,
    )

    gray = _rng(23).integers(0, 256, (9, 11), dtype=np.uint8)
    w, h, planes = _pixel_planes(png_encode(gray))
    assert (w, h) == (11, 9) and len(planes) == 1
    assert np.array_equal(planes[0], gray)

    rgb = _rng(29).integers(0, 256, (5, 6, 3), dtype=np.uint8)
    w, h, planes = _pixel_planes(png_encode(rgb))
    assert (w, h) == (6, 5) and len(planes) == 3
    for c in range(3):
        assert np.array_equal(planes[c], rgb[:, :, c])

    idx = _rng(31).integers(0, 4, (7, 8), dtype=np.uint8)
    pal = _rng(37).integers(0, 256, (4, 3), dtype=np.uint8)
    w, h, planes = _pixel_planes(gif_encode(idx, pal))
    assert (w, h) == (8, 7) and len(planes) == 1
    lum = ((299 * pal[:, 0].astype(np.int64) + 587 * pal[:, 1]
            + 114 * pal[:, 2]) // 1000).astype(np.uint8)
    assert np.array_equal(planes[0], lum[idx])

    # synthetic container: raw-plane convention preserved
    body = bytes(range(250)) * 4
    syn = make_image("gif", 25, 10, body[: 4 * 250])
    w, h, planes = _pixel_planes(syn)
    assert (w, h) == (25, 10) and len(planes) == 4
    assert planes[0].tobytes() == body[:250]
