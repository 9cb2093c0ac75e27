"""Dependency-free baseline JPEG codec (grayscale) for the multimodal
tier — the last of the three image formats to get a real decode.

Scope: baseline sequential DCT, 8-bit, SINGLE component (grayscale),
the Annex-K standard Huffman tables on the encode side and arbitrary
spec-compliant DQT/DHT on the decode side. Color (multi-component)
scans, progressive mode, and 12-bit precision raise ``ValueError`` —
rejected explicitly, never guessed. Restart markers (DRI/RSTn) are
handled: the DC predictor resets at each RST.

The full pipeline is real on both sides: forward/inverse 8×8 DCT-II
(numpy float64 orthonormal matrices), flat-16 quantization, zigzag,
DC-difference + AC run-length categories, canonical Huffman coding,
and 0xFF byte stuffing. JPEG is lossy in general, but a blockwise-
CONSTANT image with even sample values survives exactly (only the DC
coefficient is nonzero, 8·(v−128) with v even is divisible by the
flat quantizer 16), which is what lets a SQL oracle value-check the
codec chain end-to-end in ``multimodal_jpeg_codec`` while plain PSNR
tests cover the general lossy path.

Spec: the public ITU-T T.81 / ISO 10918-1 standard (baseline process,
Annex F coding procedures, Annex K reference tables).
"""

from __future__ import annotations

import struct

# Annex K.3.1 — standard luminance DC Huffman table: BITS + HUFFVAL
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K.3.2 — standard luminance AC Huffman table
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_Q = 16  # flat quantization table value (valid per spec; chosen so
#          even-valued constant blocks round-trip exactly)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    import numpy as np

    n = 8
    m = np.zeros((n, n))
    for k in range(n):
        a = (0.5 / (2.0 ** 0.5)) if k == 0 else 0.5
        for x in range(n):
            m[k, x] = a * __import__("math").cos((2 * x + 1) * k *
                                                 __import__("math").pi / 16)
    return m


def _canonical_codes(bits, vals):
    """(value → (code, length)) map from a BITS/HUFFVAL spec pair."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec
        return bytes(self.out)


def _category(v: int):
    """(size, code-bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def jpeg_encode(pixels) -> bytes:
    """Serialize a (h, w) uint8 grayscale array as a baseline JPEG
    (flat-16 quantization, Annex-K Huffman tables)."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 2 or a.shape[0] == 0 or a.shape[1] == 0:
        raise ValueError(f"need a non-empty (h, w) grayscale array, got {a.shape}")
    h, w = a.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.uint8)
    padded[:h, :w] = a
    padded[h:, :w] = a[h - 1 : h, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]

    m = _dct_matrix()
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    shifted = padded.astype(np.float64) - 128.0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = shifted[by : by + 8, bx : bx + 8]
            coef = m @ block @ m.T
            q = np.round(coef / _Q).astype(np.int64)
            zz = [int(q.flat[_ZIGZAG[i]]) for i in range(64)]
            diff = zz[0] - pred
            pred = zz[0]
            size, bits = _category(diff)
            c, ln = dc_codes[size]
            bw.put(c, ln)
            if size:
                bw.put(bits, size)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.put(c, ln)
                    run -= 16
                size, bits = _category(v)
                c, ln = ac_codes[(run << 4) | size]
                bw.put(c, ln)
                bw.put(bits, size)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]  # EOB
                bw.put(c, ln)
    data = bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = bytes([0x00]) + bytes([_Q] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([0x01, 0x11, 0x00])
    dht = (bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
           + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = bytes([0x01, 0x01, 0x00, 0x00, 0x3F, 0x00])
    return (b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof)
            + seg(0xC4, dht) + seg(0xDA, sos) + data + b"\xff\xd9")


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RSTn markers
    are surfaced via ``sync_restart``; any other marker ends the scan."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.done = False

    def _fill(self):
        if self.pos >= len(self.buf):
            self.done = True
            raise ValueError("entropy stream ended early")
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                self.done = True
                raise ValueError("hit marker inside entropy stream")
        else:
            self.pos += 1
        # keep only the unconsumed low bits before appending (bounded int)
        self.acc = ((self.acc & ((1 << self.n) - 1)) << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self):
        """Skip to just past the next RSTn marker (byte-aligned)."""
        self.n = 0
        while self.pos + 1 < len(self.buf):
            if self.buf[self.pos] == 0xFF and \
                    0xD0 <= self.buf[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_tree(bits, vals):
    """length-indexed {(length, code): value} for canonical decoding."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff(br: "_BitReader", table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode(payload: bytes):
    """Decode a baseline grayscale JPEG to a (h, w) uint8 array.

    Full pipeline: marker walk (DQT/DHT/SOF0/SOS/DRI), canonical
    Huffman decoding with 0xFF00 unstuffing and RSTn DC-predictor
    resets, dequantization, de-zigzag, float64 inverse DCT, level
    shift, clip, and crop to the declared dimensions."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI signature)")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    sof = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if pos + 2 + seg_len > n:
            raise ValueError(f"truncated segment 0x{marker:02x}")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                qt[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17 : i + 17 + cnt])
                tree = _decode_tree(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tree
                i += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError(
                    f"color JPEG ({ncomp} components) not supported — "
                    "grayscale baseline only"
                )
            if body[7] != 0x11:
                raise ValueError("subsampled single component unsupported")
            sof = (h, w, body[8])  # dims + quant table id
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG process not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            if body[0] != 1:
                raise ValueError("multi-component scan not supported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            h, w, tq = sof
            if tq not in qt or dc_id not in huff_dc or ac_id not in huff_ac:
                raise ValueError("missing quant/Huffman table")
            q = np.array(qt[tq], dtype=np.float64)
            m = _dct_matrix()
            ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
            out = np.empty((ph, pw), dtype=np.uint8)
            br = _BitReader(payload, pos + 2 + seg_len)
            pred = 0
            blocks_done = 0
            dezig = np.argsort(np.array(_ZIGZAG))  # natural ← zigzag
            for by in range(0, ph, 8):
                for bx in range(0, pw, 8):
                    if restart_interval and blocks_done and \
                            blocks_done % restart_interval == 0:
                        br.sync_restart()
                        pred = 0
                    try:
                        zz = np.zeros(64, dtype=np.float64)
                        size = _read_huff(br, huff_dc[dc_id])
                        pred += _extend(br.bits(size), size)
                        zz[0] = pred
                        k = 1
                        while k < 64:
                            rs = _read_huff(br, huff_ac[ac_id])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            s = rs & 0x0F
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                    except _RestartMarker:
                        raise ValueError("unexpected restart marker")
                    coef = (zz * q)[dezig].reshape(8, 8)
                    block = m.T @ coef @ m + 128.0
                    out[by : by + 8, bx : bx + 8] = np.clip(
                        np.round(block), 0, 255
                    ).astype(np.uint8)
                    blocks_done += 1
            return out[:h, :w]
        pos += 2 + seg_len
    raise ValueError("no scan data in JPEG")
