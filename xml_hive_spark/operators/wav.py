"""Dependency-free WAV (RIFF/PCM) codec for the multimodal audio tier.

Companion to ``png.py``: real container + sample decode for the AUDIO
modality using the stdlib only. WAV is the canonical uncompressed
interchange format; "decode" here is the full RIFF chunk walk (fmt
validation, chunk skipping over LIST/fact/etc., word alignment) plus
PCM sample extraction to numpy — 8-bit unsigned and 16-bit
signed little-endian, mono or multi-channel. Compressed codecs
(format tags other than 1/PCM) raise ``ValueError`` — rejected
explicitly, never guessed.

Reference parity note: the reference engine has no multimodal tier;
this is beyond-reference LLM-pipeline surface (BASELINE.md
north_star).

Spec: the public RIFF/WAVE format (Microsoft/IBM multimedia
programming interface spec): little-endian chunk sizes, 'fmt ' chunk
(audio format, channels, sample rate, bits/sample), 'data' chunk of
interleaved frames, chunks word-aligned (odd sizes padded one byte).
"""

from __future__ import annotations

import struct


def wav_encode(samples, sample_rate: int = 16000, bits: int = 16,
               pad_chunk: bool = True) -> bytes:
    """Serialize a (n,) mono or (n, ch) interleaved numpy array as a
    spec-compliant WAV. ``bits`` 16 → int16 LE; 8 → uint8.
    ``pad_chunk`` inserts an odd-sized junk chunk before 'data' so
    decoders must implement chunk-skipping + word alignment to pass the
    round trip."""
    import numpy as np

    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[0] == 0:
        raise ValueError(f"unsupported sample shape {a.shape}")
    n, ch = a.shape
    if bits == 16:
        body = a.astype("<i2").tobytes()
    elif bits == 8:
        body = a.astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if pad_chunk:
        junk = b"\x07\x08\x09"  # odd length → exercises word alignment
        chunks += b"junk" + struct.pack("<I", len(junk)) + junk + b"\x00"
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(payload: bytes):
    """Decode a PCM WAV to (samples, sample_rate): samples is a
    (n, ch) numpy array (int16 for 16-bit, uint8 for 8-bit).

    Full RIFF walk: signature check, chunk iteration with word
    alignment, 'fmt ' validation (PCM only, block-align consistency),
    'data' extraction truncated to whole frames. Raises ``ValueError``
    on structural damage or non-PCM encodings."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_len)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, ch, rate, byte_rate, block, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"compressed WAV (format tag {audio_fmt}) not supported")
    if ch < 1 or bits not in (8, 16) or block != ch * (bits // 8):
        raise ValueError(f"inconsistent fmt (ch={ch} bits={bits} block={block})")
    if byte_rate != rate * block:
        raise ValueError("inconsistent byte rate")
    frames = len(data) // block
    dt = np.dtype("<i2") if bits == 16 else np.dtype(np.uint8)
    a = np.frombuffer(data[: frames * block], dtype=dt).reshape(frames, ch)
    return a, rate
