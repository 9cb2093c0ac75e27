"""Baseline-JPEG codec tests: EXACT round trips on blockwise-constant
even-valued images (DC-only blocks survive flat-16 quantization
losslessly), PSNR floors on general lossy content, a hand-assembled
scan pinning the decoder against T.81 Annex-K arithmetic independently
of the encoder, restart-marker handling, and explicit rejections."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from xml_hive_spark.operators.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    jpeg_decode,
    jpeg_encode,
)


def _rng(seed):
    return np.random.default_rng(seed)


def _psnr(a, b):
    mse = float(((a.astype(float) - b.astype(float)) ** 2).mean())
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


class TestExactPath:
    @pytest.mark.parametrize("grid", [(1, 1), (2, 3), (4, 4), (7, 2)])
    def test_blockwise_constant_even_is_lossless(self, grid):
        blocks = _rng(3).integers(0, 128, grid, dtype=np.uint8) * 2
        px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        assert np.array_equal(jpeg_decode(jpeg_encode(px)), px)

    def test_flat_image_extremes(self):
        for v in (0, 128, 254):
            px = np.full((16, 24), v, dtype=np.uint8)
            assert np.array_equal(jpeg_decode(jpeg_encode(px)), px)

    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def test_property_blockwise(self, data):
        bh = data.draw(st.integers(1, 5))
        bw = data.draw(st.integers(1, 5))
        seed = data.draw(st.integers(0, 2**31))
        blocks = _rng(seed).integers(0, 128, (bh, bw), dtype=np.uint8) * 2
        px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        assert np.array_equal(jpeg_decode(jpeg_encode(px)), px)


class TestLossyPath:
    def test_noise_psnr_floor(self):
        px = _rng(11).integers(0, 256, (48, 64), dtype=np.uint8)
        assert _psnr(jpeg_decode(jpeg_encode(px)), px) > 30

    def test_gradient_psnr_floor(self):
        px = np.add.outer(np.arange(33), np.arange(47)).astype(np.uint8) * 3
        assert _psnr(jpeg_decode(jpeg_encode(px)), px) > 38

    def test_odd_dimensions_cropped(self):
        px = _rng(13).integers(0, 256, (13, 9), dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(px))
        assert dec.shape == (13, 9)
        assert _psnr(dec, px) > 28


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _tables_dqt_dht():
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    dht = _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
               + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    return dqt, dht


class TestSpecAnchored:
    def test_hand_assembled_dc_only_scan(self):
        """8x8 all-128: DC diff 0 → DC category-0 code '00' (Annex K),
        EOB '1010', padded with 1-bits → single data byte 0x2B."""
        dqt, dht = _tables_dqt_dht()
        sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        sos = _seg(0xDA, bytes([0x01, 0x01, 0x00, 0x00, 0x3F, 0x00]))
        payload = (b"\xff\xd8" + dqt + sof + dht + sos
                   + bytes([0x2B]) + b"\xff\xd9")
        dec = jpeg_decode(payload)
        assert dec.shape == (8, 8)
        assert np.array_equal(dec, np.full((8, 8), 128, dtype=np.uint8))

    def test_restart_marker_resets_dc_predictor(self):
        """Two blocks with DRI=1 and an RST0 between them: each block
        codes DC diff 0 against a RESET predictor → both decode to 128."""
        dqt, dht = _tables_dqt_dht()
        sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        dri = _seg(0xDD, struct.pack(">H", 1))
        sos = _seg(0xDA, bytes([0x01, 0x01, 0x00, 0x00, 0x3F, 0x00]))
        payload = (b"\xff\xd8" + dqt + sof + dht + dri + sos
                   + bytes([0x2B]) + b"\xff\xd0" + bytes([0x2B]) + b"\xff\xd9")
        dec = jpeg_decode(payload)
        assert dec.shape == (8, 16)
        assert np.array_equal(dec, np.full((8, 16), 128, dtype=np.uint8))


class TestRejection:
    def _jpg(self):
        return jpeg_encode(np.full((8, 8), 100, dtype=np.uint8))

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="SOI"):
            jpeg_decode(b"XX" + self._jpg()[2:])

    def test_color_rejected(self):
        dqt, dht = _tables_dqt_dht()
        sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 3)
                   + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
        with pytest.raises(ValueError, match="color"):
            jpeg_decode(b"\xff\xd8" + dqt + sof + dht + b"\xff\xd9")

    def test_progressive_rejected(self):
        p = bytearray(self._jpg())
        at = p.index(b"\xff\xc0")
        p[at + 1] = 0xC2  # SOF2: progressive
        with pytest.raises(ValueError, match="non-baseline"):
            jpeg_decode(bytes(p))

    def test_truncated_stream(self):
        with pytest.raises(ValueError):
            jpeg_decode(self._jpg()[:-8] + b"")

    def test_16bit_quant_rejected(self):
        dqt = _seg(0xDB, bytes([0x10]) + bytes([0, 16] * 64))
        with pytest.raises(ValueError, match="16-bit"):
            jpeg_decode(b"\xff\xd8" + dqt + b"\xff\xd9")


def test_header_parser_agrees():
    from xml_hive_spark.operators.multimodal import decode_image_header

    px = np.full((24, 40), 64, dtype=np.uint8)
    meta = decode_image_header(jpeg_encode(px))
    assert (meta["format"], meta["width"], meta["height"]) == ("jpeg", 40, 24)
