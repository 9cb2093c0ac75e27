"""WAV codec exactness: round trips over mono/stereo and 8/16-bit
shapes (with an odd-sized junk chunk forcing real chunk-walking), a
hand-assembled WAV pinning the decoder against the RIFF spec
independently of the encoder, and explicit rejection of damaged or
compressed inputs."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from xml_hive_spark.operators.wav import wav_decode, wav_encode


def _rng(seed):
    return np.random.default_rng(seed)


class TestRoundTrip:
    @pytest.mark.parametrize("ch", [1, 2, 4])
    @pytest.mark.parametrize("pad", [True, False])
    def test_int16(self, ch, pad):
        s = _rng(3).integers(-32768, 32768, (50, ch), dtype=np.int16)
        dec, rate = wav_decode(wav_encode(s, 22050, 16, pad))
        assert rate == 22050
        assert np.array_equal(dec, s)

    def test_mono_1d_input(self):
        s = _rng(5).integers(-32768, 32768, 33, dtype=np.int16)
        dec, _ = wav_decode(wav_encode(s))
        assert dec.shape == (33, 1)
        assert np.array_equal(dec[:, 0], s)

    def test_uint8(self):
        s = _rng(7).integers(0, 256, (21, 2), dtype=np.uint8)
        dec, rate = wav_decode(wav_encode(s, 8000, 8))
        assert rate == 8000 and dec.dtype == np.uint8
        assert np.array_equal(dec, s)

    def test_odd_data_length_padded(self):
        # 8-bit mono with odd frame count -> odd data chunk, pad byte
        s = np.arange(7, dtype=np.uint8)
        dec, _ = wav_decode(wav_encode(s, 8000, 8))
        assert np.array_equal(dec[:, 0], s)

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_property(self, data):
        n = data.draw(st.integers(1, 64))
        ch = data.draw(st.integers(1, 3))
        bits = data.draw(st.sampled_from([8, 16]))
        seed = data.draw(st.integers(0, 2**31))
        if bits == 16:
            s = _rng(seed).integers(-32768, 32768, (n, ch), dtype=np.int16)
        else:
            s = _rng(seed).integers(0, 256, (n, ch), dtype=np.uint8)
        dec, _ = wav_decode(wav_encode(s, 44100, bits))
        assert np.array_equal(dec, s)


def test_hand_built_wav():
    """Decoder vs a byte-level hand assembly (never saw the encoder):
    16-bit stereo, two frames, a LIST chunk to skip."""
    body = struct.pack("<4h", 100, -200, 3000, -40)  # L0 R0 L1 R1
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    chunks = (b"fmt " + struct.pack("<I", 16) + fmt
              + b"LIST" + struct.pack("<I", 4) + b"INFO"
              + b"data" + struct.pack("<I", len(body)) + body)
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    dec, rate = wav_decode(payload)
    assert rate == 8000
    assert np.array_equal(dec, np.array([[100, -200], [3000, -40]], np.int16))


class TestRejection:
    def _wav(self):
        return wav_encode(np.arange(10, dtype=np.int16))

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            wav_decode(b"JUNK" + self._wav()[4:])

    def test_compressed_rejected(self):
        p = bytearray(self._wav())
        # format tag lives at offset 20 (RIFF8 + WAVE4 + 'fmt '4 + len4)
        p[20] = 3  # IEEE float
        with pytest.raises(ValueError, match="compressed"):
            wav_decode(bytes(p))

    def test_truncated_chunk(self):
        with pytest.raises(ValueError):
            wav_decode(self._wav()[:30])

    def test_inconsistent_block_align(self):
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 7, 16)  # block!=4
        chunks = (b"fmt " + struct.pack("<I", 16) + fmt
                  + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
        p = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        with pytest.raises(ValueError, match="inconsistent fmt"):
            wav_decode(p)

    def test_missing_data_chunk(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        chunks = b"fmt " + struct.pack("<I", 16) + fmt
        p = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        with pytest.raises(ValueError, match="missing"):
            wav_decode(p)
