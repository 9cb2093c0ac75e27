"""Multimodal-column plumbing (BASELINE.md north_star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract run as Arrow-batched ``mapInPandas``
stages. The decode kernel is a REAL, dependency-free container parser:
PNG IHDR / JPEG SOFn / GIF logical-screen-descriptor headers read with
``struct`` — it reports correct dimensions for any real file of those
formats. Codec *decompression* is REAL for PNG (``png.py``: zlib IDAT
inflate + all five scanline unfilters), GIF (``gif.py``: full
variable-width LZW, routed through ``_pixel_planes`` whenever a global
color table is present), WAV (``wav.py``), and baseline JPEG
(``jpeg.py``: Huffman + DCT) — each value-oracled end-to-end by its
``multimodal_*_codec`` registry query. Inside ``_pixel_planes`` only
JPEG stays header-only (its fixtures store raw 8-bit grayscale planes
after a valid SOF0 header via ``synth_media``); resize / frame-sample
pool genuine pixels at genuine parsed dimensions either way. Swapping
``_pixel_planes`` for a PIL/ffmpeg call changes nothing outside it.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import fan_out, query, t

DECODE_SCHEMA = (
    "doc_id long, byte_len int, checksum long, width int, height int, format string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_image(kind: str, width: int, height: int, body: bytes) -> bytes:
    """Serialize a minimal VALID image container of ``kind`` carrying
    ``body`` after the header. Every header field is real — a strict
    external parser agrees on width/height/format:

    - png: signature + IHDR chunk (big-endian dims, 8-bit grayscale,
      correct CRC32)
    - jpeg: SOI + APP0/JFIF + SOF0 baseline frame (big-endian dims)
    - gif: GIF89a + logical screen descriptor (little-endian dims)
    """
    if kind == "png":
        ihdr = b"IHDR" + struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        return (
            _PNG_SIG
            + struct.pack(">I", 13)
            + ihdr
            + struct.pack(">I", zlib.crc32(ihdr))
            + body
        )
    if kind == "jpeg":
        app0 = (
            b"\xff\xe0"
            + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HHBB", 1, 1, 0, 0)
        )
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">HBHHB", 11, 8, height, width, 1)
            + b"\x01\x11\x00"
        )
        return b"\xff\xd8" + app0 + sof0 + body
    if kind == "gif":
        return (
            b"GIF89a"
            + struct.pack("<HH", width, height)
            + bytes([0x70, 0, 0])  # packed fields, bg color, aspect
            + body
        )
    raise ValueError(f"unknown kind: {kind}")


def decode_image_header(payload: bytes) -> dict:
    """REAL header decode with stdlib ``struct`` only — no codec libs.

    PNG: IHDR dims at bytes 16..24 (big-endian u32 pair). GIF: logical
    screen descriptor at 6..10 (little-endian u16 pair). JPEG: marker
    walk to the first SOFn (C0-CF minus C4/C8/CC), dims at +5 (height
    then width, big-endian u16). Unknown magic → format 'unknown',
    dimensions -1 (never invented)."""
    meta = {"byte_len": len(payload), "checksum": zlib.crc32(payload)}
    if payload[:8] == _PNG_SIG and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return {**meta, "width": w, "height": h, "format": "png"}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {**meta, "width": w, "height": h, "format": "gif"}
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return {**meta, "width": w, "height": h, "format": "jpeg"}
                break
            i += 2 + seg_len
        return {**meta, "width": -1, "height": -1, "format": "jpeg"}
    return {**meta, "width": -1, "height": -1, "format": "unknown"}


def _body_offset(payload: bytes, fmt: str) -> int:
    """Offset of the pixel body in a ``make_image`` container (header
    walk is real; the raw-plane body layout is this engine's synthetic
    storage convention — a codec would inflate IDAT / IDCT here)."""
    if fmt == "png":
        return 8 + 4 + 4 + 13 + 4  # sig + len + "IHDR" + fields + crc
    if fmt == "gif":
        return 13  # sig(6) + dims(4) + packed/bg/aspect(3)
    if fmt == "jpeg":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            i += 2 + seg_len
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return i  # body follows the SOF segment
        return n
    return 0


def _pixel_planes(payload: bytes):
    """(width, height, planes) from a container: parse the real header,
    then extract pixels. A REAL PNG (IDAT chunk present) or a real GIF
    with an LZW image stream decodes through the actual codec
    (``png.png_decode`` / ``gif.gif_decode`` — RGB planes are split
    per channel); the ``make_image`` synthetic convention (raw
    grayscale planes after a valid header) is the fallback, and the
    remaining swap point is JPEG only (DCT)."""
    import numpy as np

    meta = decode_image_header(payload)
    w, h = meta["width"], meta["height"]
    if w <= 0 or h <= 0:
        return meta["width"], meta["height"], []
    if meta["format"] == "png" and b"IDAT" in payload:
        from xml_hive_spark.operators.png import png_decode

        try:
            img = png_decode(payload)
            if img.ndim == 2:
                return w, h, [img]
            return w, h, [img[:, :, c] for c in range(img.shape[2])]
        except ValueError:
            pass  # unsupported PNG shape → raw-plane convention below
    if meta["format"] == "gif" and len(payload) > 10 \
            and payload[10] & 0x80:
        # global color table present → a real encoded GIF (the
        # make_image synthetic convention writes packed=0x70, no GCT,
        # so raw-plane bodies can never be mistaken for an LZW stream)
        from xml_hive_spark.operators.gif import gif_decode

        try:
            idx, pal = gif_decode(payload)
            # grayscale plane via the palette's luminance (integer BT.601)
            lum = ((299 * pal[:, 0].astype(np.int64)
                    + 587 * pal[:, 1] + 114 * pal[:, 2]) // 1000
                   ).astype(np.uint8)
            if idx.size and int(idx.max()) >= len(lum):
                # LZW min-code-size larger than the color table: indices
                # point past the palette — damaged, not decodable
                raise ValueError("palette index out of range")
            return w, h, [lum[idx]]
        except (ValueError, IndexError):
            # damaged stream → raw-plane convention below (IndexError
            # included: a malformed record must degrade, never kill the
            # whole mapInPandas task)
            pass
    body = payload[_body_offset(payload, meta["format"]) :]
    n_planes = max(len(body) // (w * h), 0)
    arr = np.frombuffer(body[: n_planes * w * h], dtype=np.uint8)
    return w, h, [arr[i * w * h : (i + 1) * w * h].reshape(h, w)
                  for i in range(n_planes)]


def synth_media_stage(df: DataFrame, id_col: str = "doc_id",
                      bin_col: str = "payload", planes: int = 1) -> DataFrame:
    """Deterministic synthetic-media fixture stage: wrap each payload's
    bytes as the pixel body of a valid PNG/JPEG/GIF container (format by
    ``doc_id % 3``, dimensions derived from the byte length), tiled to
    exactly ``planes`` full w×h grayscale planes. This is the corpus
    generator for the decode/resize/frame operators — headers are valid,
    so the downstream parsers are exercised for real."""
    return fan_out(df).mapInPandas(
        _synth_media_batches(id_col, bin_col, planes),
        schema="doc_id long, payload binary",
    )


def _synth_media_batches(id_col: str, bin_col: str, planes: int):
    """Batch transform of :func:`synth_media_stage` (exposed for the
    fused pipelines — see :func:`_synth_png_batches`)."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_payload = [], []
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) or b"\x00"
                w = 16 + (len(raw) % 48)
                h = 16 + ((len(raw) * 7) % 48)
                body = np.resize(
                    np.frombuffer(raw, dtype=np.uint8), planes * w * h
                ).tobytes()
                kind = ("png", "jpeg", "gif")[int(did) % 3]
                out_id.append(did)
                out_payload.append(make_image(kind, w, h, body))
            yield pd.DataFrame({"doc_id": out_id, "payload": out_payload})

    return synth


def decode_binary_metadata(df: DataFrame, id_col: str = "doc_id",
                           bin_col: str = "payload") -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over (id, binary) batches.
    Batch shape = Arrow record batches; per-batch Python cost is one loop
    over payloads, no JVM↔Python per-row chatter. The kernel is the real
    header parser (``decode_image_header``)."""
    return df.mapInPandas(
        _decode_binary_metadata_batches(id_col, bin_col), schema=DECODE_SCHEMA
    )


def _decode_binary_metadata_batches(id_col: str, bin_col: str):
    """Batch transform of :func:`decode_binary_metadata`."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_header(bytes(p)) for p in pdf[bin_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return decode


@query(
    "multimodal_decode_stub",
    oracle="""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
              ELSE 'gif' END AS format,
         16 + (GREATEST(octet_length(CAST(text AS BLOB)), 1) % 48) AS w,
         16 + ((GREATEST(octet_length(CAST(text AS BLOB)), 1) * 7) % 48) AS h,
         CASE doc_id % 3 WHEN 2 THEN 13 ELSE 33 END AS hdr
  FROM documents
)
SELECT format, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(hdr + w * h) AS BIGINT) AS total_bytes,
       round(avg(w), 2) AS avg_width,
       round(avg(h), 2) AS avg_height
FROM m GROUP BY format ORDER BY format
""",
    tags=("multimodal", "binary", "mapinpandas"),
)
def multimodal_decode_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column pipeline: text → valid PNG/JPEG/GIF container
    (``synth_media_stage``) → mapInPandas REAL header decode → typed
    metadata → aggregate. (Name kept from earlier rounds for snapshot
    continuity; the decode kernel is no longer a stub — see
    decode_image_header.)

    FULLY value-oracled since late r8 (was rows-only): the containers
    carry no compression, so every metadata field is a closed form of
    the document — format = doc_id % 3; w = 16 + (blen % 48),
    h = 16 + ((7·blen) % 48) with blen = utf-8 byte length (floored at
    1 for empty text, the generator's ``or b"\x00"``); byte_len =
    header (PNG 33 = 8 sig + 4 len + 17 IHDR + 4 CRC, JPEG 33 = SOI +
    APP0 + SOF0, GIF 13 = GIF89a + screen descriptor) + w·h body. The
    driver's hash therefore checks the synth container writer AND the
    real header parser against pure arithmetic.

    r13: synth+decode fused in one mapInPandas — containers never
    cross the Arrow/JVM boundary (see ``multimodal_png_codec``)."""
    docs = t(spark, sf, "documents")
    synth = _synth_media_batches("doc_id", "payload", 1)
    decode = _decode_binary_metadata_batches("doc_id", "payload")
    meta = fan_out(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    ).mapInPandas(lambda it: decode(synth(it)), schema=DECODE_SCHEMA)
    return (
        meta.groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("byte_len").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
        )
        .orderBy("format")
    )


@query(
    "binary_column_stats",
    oracle="""
SELECT octet_length(CAST(text AS BLOB)) AS byte_len, count(*) AS n
FROM documents GROUP BY octet_length(CAST(text AS BLOB))
""",
    tags=("multimodal", "binary"),
)
def binary_column_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Typed binary column handled by built-ins only (length over
    BinaryType) — the metadata-side of multimodal storage, SQL-oracle'd."""
    docs = t(spark, sf, "documents")
    return (
        docs.select(F.length(F.encode("text", "utf-8")).alias("byte_len"))
        .groupBy("byte_len")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _synth_png_batches(id_col: str):
    """Batch transform of :func:`synth_png_stage`, exposed so the fused
    round trip can chain it inside ONE Python worker pass."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml_hive_spark.operators.png import png_encode

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 8 + did % 9, 8 + (did * 3) % 7
                i = np.arange(w * h, dtype=np.int64)
                px = ((did * 2654435761 + i * 40503) % 256).astype(np.uint8)
                ids.append(did)
                payloads.append(png_encode(px.reshape(h, w)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return synth


def synth_png_stage(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one REAL compressed PNG per row (``png.png_encode``:
    IHDR + deflated IDAT + CRCs, per-scanline filter cycle 0..4).
    Dimensions and pixels are pure functions of the id — w = 8 + id%9,
    h = 8 + (3·id)%7, px[i] = (id·2654435761 + i·40503) mod 256 — so a
    SQL oracle can recompute pixel checksums without a codec."""
    return fan_out(df).mapInPandas(
        _synth_png_batches(id_col), schema="doc_id long, payload binary"
    )


def _decode_png_batches(id_col: str, bin_col: str):
    """Batch transform of :func:`decode_png_stage` (see
    :func:`_synth_png_batches` for why it is exposed)."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml_hive_spark.operators.png import png_decode

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "px_sum": [], "px_dot": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                img = png_decode(bytes(payload))
                px = img.reshape(-1).astype(np.int64)
                i = np.arange(len(px), dtype=np.int64)
                out["doc_id"].append(int(did))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["px_sum"].append(int(px.sum()))
                out["px_dot"].append(int((i * px).sum()))
            yield pd.DataFrame(out)

    return decode


def decode_png_stage(df: DataFrame, id_col: str = "doc_id",
                     bin_col: str = "payload") -> DataFrame:
    """Full PNG decode per row (``png.png_decode``: chunk walk + CRC
    verify + zlib inflate + scanline unfilter) emitting dimensions and
    two pixel checksums — px_sum (order-invariant) and px_dot
    (Σ i·px[i], order-SENSITIVE: a decoder that shuffles, drops, or
    mis-unfilters any pixel changes it)."""
    return df.mapInPandas(
        _decode_png_batches(id_col, bin_col),
        schema="doc_id long, width int, height int, px_sum long, px_dot long",
    )


@query(
    "multimodal_png_codec",
    oracle="""
SELECT d.doc_id,
       CAST(8 + d.doc_id % 9 AS INT) AS width,
       CAST(8 + (d.doc_id * 3) % 7 AS INT) AS height,
       CAST(SUM((d.doc_id * 2654435761 + t.i * 40503) % 256) AS BIGINT) AS px_sum,
       CAST(SUM(t.i * ((d.doc_id * 2654435761 + t.i * 40503) % 256)) AS BIGINT) AS px_dot
FROM documents d
CROSS JOIN range(0, 224) t(i)  -- 224 = max w*h = 16*14
WHERE t.i < (8 + d.doc_id % 9) * (8 + (d.doc_id * 3) % 7)
GROUP BY d.doc_id
""",
    tags=("multimodal", "png", "codec"),
)
def multimodal_png_codec(spark: SparkSession, sf: str) -> DataFrame:
    """REAL PNG round trip, distributed, with a full SQL value oracle:
    encode one spec-compliant compressed PNG per document (deflated
    IDAT, filter cycle over all five scanline filters), decode it back
    (chunk walk, CRC verify, inflate, unfilter), and emit pixel
    checksums. Because the pixels are a pure (doc_id, i) formula,
    DuckDB recomputes the exact order-sensitive checksum WITHOUT any
    codec — the oracle fails if one pixel of one row is wrong, so the
    whole codec chain (both directions) is value-checked by the
    driver's hash gate, not just row-counted.

    The reference has no multimodal tier (BASELINE.md north_star:
    beyond-reference LLM-pipeline surface); codec decompression was
    round 5's one documented multimodal swap point — closed here for
    PNG with the stdlib (zlib) only.

    r13 (guide §4.1 — control how many columns/bytes cross the
    boundary): the encode and decode batch transforms are CHAINED
    inside ONE mapInPandas, so the PNG payloads never cross the
    Arrow/JVM boundary at all — the r5–r12 two-stage plan shipped
    every payload Python→JVM→Python between adjacent MapInPandas
    nodes (two serializations of every image, pure overhead with both
    codec directions still fully exercised). Measured at sf0.1:
    min-of-runs 0.851 → 0.593 s, plan 2 MapInPandas → 1, identical
    output (oracle-green at sf0.001/0.01/0.1)."""
    docs = t(spark, sf, "documents").select("doc_id")
    synth = _synth_png_batches("doc_id")
    decode = _decode_png_batches("doc_id", "payload")
    return fan_out(docs).mapInPandas(
        lambda it: decode(synth(it)),
        schema="doc_id long, width int, height int, px_sum long, px_dot long",
    )


def synth_wav_stage(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one REAL PCM WAV per row (``wav.wav_encode``: RIFF walk
    material — fmt chunk, an odd-sized junk chunk forcing word-aligned
    chunk skipping, int16 interleaved data). Frames/channels/rate and
    samples are pure functions of the id: frames = 64 + id%97,
    ch = 1 + id%2, rate = 8000 + (id%5)·4000,
    s[k] = ((id·48271 + k·12345) mod 65536) − 32768 over interleaved
    index k — so a SQL oracle recomputes sample checksums codec-free."""
    return fan_out(df).mapInPandas(
        _synth_wav_batches(id_col), schema="doc_id long, payload binary"
    )


def _synth_wav_batches(id_col: str):
    """Batch transform of :func:`synth_wav_stage` (exposed for the
    fused round trip — see :func:`_synth_png_batches`)."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml_hive_spark.operators.wav import wav_encode

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf[id_col]:
                did = int(did)
                frames, ch = 64 + did % 97, 1 + did % 2
                rate = 8000 + (did % 5) * 4000
                k = np.arange(frames * ch, dtype=np.int64)
                s = ((did * 48271 + k * 12345) % 65536 - 32768).astype(
                    np.int16
                )
                ids.append(did)
                payloads.append(
                    wav_encode(s.reshape(frames, ch), rate, 16)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return synth


def decode_wav_stage(df: DataFrame, id_col: str = "doc_id",
                     bin_col: str = "payload") -> DataFrame:
    """Full WAV decode per row (``wav.wav_decode``) emitting shape,
    rate, and two sample checksums over the interleaved stream —
    s_sum (order-invariant) and s_dot (Σ k·s[k], order-sensitive: any
    dropped, swapped, or mis-parsed sample changes it)."""
    return df.mapInPandas(
        _decode_wav_batches(id_col, bin_col),
        schema=("doc_id long, n_frames int, channels int, "
                "sample_rate int, s_sum long, s_dot long"),
    )


def _decode_wav_batches(id_col: str, bin_col: str):
    """Batch transform of :func:`decode_wav_stage`."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml_hive_spark.operators.wav import wav_decode

        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "channels": [],
                   "sample_rate": [], "s_sum": [], "s_dot": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                a, rate = wav_decode(bytes(payload))
                s = a.reshape(-1).astype(np.int64)
                k = np.arange(len(s), dtype=np.int64)
                out["doc_id"].append(int(did))
                out["n_frames"].append(a.shape[0])
                out["channels"].append(a.shape[1])
                out["sample_rate"].append(int(rate))
                out["s_sum"].append(int(s.sum()))
                out["s_dot"].append(int((k * s).sum()))
            yield pd.DataFrame(out)

    return decode


@query(
    "multimodal_wav_codec",
    oracle="""
SELECT d.doc_id,
       CAST(64 + d.doc_id % 97 AS INT) AS n_frames,
       CAST(1 + d.doc_id % 2 AS INT) AS channels,
       CAST(8000 + (d.doc_id % 5) * 4000 AS INT) AS sample_rate,
       CAST(SUM((d.doc_id * 48271 + t.k * 12345) % 65536 - 32768) AS BIGINT) AS s_sum,
       CAST(SUM(t.k * ((d.doc_id * 48271 + t.k * 12345) % 65536 - 32768)) AS BIGINT) AS s_dot
FROM documents d
CROSS JOIN range(0, 320) t(k)  -- 320 = max frames*ch = 160*2
WHERE t.k < (64 + d.doc_id % 97) * (1 + d.doc_id % 2)
GROUP BY d.doc_id
""",
    tags=("multimodal", "audio", "wav", "codec"),
)
def multimodal_wav_codec(spark: SparkSession, sf: str) -> DataFrame:
    """REAL PCM-WAV round trip for the AUDIO modality, distributed,
    with a full SQL value oracle (same design as
    ``multimodal_png_codec``): encode one spec-compliant WAV per
    document — fmt chunk, junk-chunk word alignment, interleaved int16
    frames — decode it back with the RIFF chunk walk, and emit
    order-sensitive sample checksums that DuckDB recomputes from the
    (doc_id, k) formula without any codec. The driver's hash gate
    value-checks the full audio codec chain.

    r13: encode+decode fused in one mapInPandas — payloads never cross
    the Arrow/JVM boundary (see ``multimodal_png_codec``)."""
    docs = t(spark, sf, "documents").select("doc_id")
    synth = _synth_wav_batches("doc_id")
    decode = _decode_wav_batches("doc_id", "payload")
    return fan_out(docs).mapInPandas(
        lambda it: decode(synth(it)),
        schema=("doc_id long, n_frames int, channels int, "
                "sample_rate int, s_sum long, s_dot long"),
    )


def synth_gif_stage(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one REAL GIF89a per row (``gif.gif_encode``: logical
    screen descriptor, global color table, NETSCAPE extension block,
    LZW-compressed index stream). Shape, palette, and pixels are pure
    functions of the id: w = 6 + id%11, h = 6 + (5·id)%9,
    k = 2 + id%15 colors, idx[i] = (id·7919 + i·104729) mod k,
    pal[c][ch] = (id·31 + c·37 + ch·101) mod 256."""
    return fan_out(df).mapInPandas(
        _synth_gif_batches(id_col), schema="doc_id long, payload binary"
    )


def _synth_gif_batches(id_col: str):
    """Batch transform of :func:`synth_gif_stage` (exposed for the
    fused round trip — see :func:`_synth_png_batches`)."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml_hive_spark.operators.gif import gif_encode

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h, k = 6 + did % 11, 6 + (did * 5) % 9, 2 + did % 15
                i = np.arange(w * h, dtype=np.int64)
                idx = ((did * 7919 + i * 104729) % k).astype(np.uint8)
                c = np.arange(k)[:, None]
                ch = np.arange(3)[None, :]
                pal = ((did * 31 + c * 37 + ch * 101) % 256).astype(np.uint8)
                ids.append(did)
                payloads.append(
                    gif_encode(idx.reshape(h, w), pal, loop_ext=True)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return synth


def decode_gif_stage(df: DataFrame, id_col: str = "doc_id",
                     bin_col: str = "payload") -> DataFrame:
    """Full GIF decode per row (``gif.gif_decode``: container walk,
    extension skipping, LZW decompression) emitting dimensions, color
    count, order-sensitive index checksums, and a palette checksum."""
    return df.mapInPandas(
        _decode_gif_batches(id_col, bin_col),
        schema=("doc_id long, width int, height int, n_colors int, "
                "idx_sum long, idx_dot long, pal_sum long"),
    )


def _decode_gif_batches(id_col: str, bin_col: str):
    """Batch transform of :func:`decode_gif_stage`."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml_hive_spark.operators.gif import gif_decode

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "n_colors": [],
                   "idx_sum": [], "idx_dot": [], "pal_sum": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                did = int(did)
                idx, pal = gif_decode(bytes(payload))
                k = 2 + did % 15  # GCT is padded to a power of two;
                # checksum the k REAL palette entries
                v = idx.reshape(-1).astype(np.int64)
                i = np.arange(len(v), dtype=np.int64)
                out["doc_id"].append(did)
                out["height"].append(idx.shape[0])
                out["width"].append(idx.shape[1])
                out["n_colors"].append(k)
                out["idx_sum"].append(int(v.sum()))
                out["idx_dot"].append(int((i * v).sum()))
                out["pal_sum"].append(int(pal[:k].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return decode


@query(
    "multimodal_gif_codec",
    oracle="""
SELECT s.doc_id, s.width, s.height, s.n_colors,
       (SELECT CAST(SUM((s.doc_id * 7919 + t.i * 104729) % s.n_colors) AS BIGINT)
        FROM range(0, 224) t(i) WHERE t.i < s.width * s.height) AS idx_sum,
       (SELECT CAST(SUM(t.i * ((s.doc_id * 7919 + t.i * 104729) % s.n_colors)) AS BIGINT)
        FROM range(0, 224) t(i) WHERE t.i < s.width * s.height) AS idx_dot,
       (SELECT CAST(SUM((s.doc_id * 31 + (p.j // 3) * 37 + (p.j % 3) * 101) % 256) AS BIGINT)
        FROM range(0, 48) p(j) WHERE p.j < s.n_colors * 3) AS pal_sum
FROM (
  SELECT doc_id,
         CAST(6 + doc_id % 11 AS INT) AS width,
         CAST(6 + (doc_id * 5) % 9 AS INT) AS height,
         CAST(2 + doc_id % 15 AS INT) AS n_colors
  FROM documents
) s
""",
    tags=("multimodal", "gif", "lzw", "codec"),
)
def multimodal_gif_codec(spark: SparkSession, sf: str) -> DataFrame:
    """REAL GIF round trip with LZW compression, distributed, with a
    full SQL value oracle (same design as the PNG/WAV twins): encode
    one GIF89a per document — color table, extension block, real
    variable-width LZW stream — decode it back (container walk + LZW),
    and emit order-sensitive index checksums plus a palette checksum
    that DuckDB recomputes from pure (doc_id, i) formulas. With
    ``multimodal_png_codec`` this makes two of the three image formats
    fully decoded (JPEG remains header-only: DCT entropy coding is the
    one genuinely out-of-scope kernel).

    r13: encode+decode fused in one mapInPandas — payloads never cross
    the Arrow/JVM boundary (see ``multimodal_png_codec``)."""
    docs = t(spark, sf, "documents").select("doc_id")
    synth = _synth_gif_batches("doc_id")
    decode = _decode_gif_batches("doc_id", "payload")
    return fan_out(docs).mapInPandas(
        lambda it: decode(synth(it)),
        schema=("doc_id long, width int, height int, n_colors int, "
                "idx_sum long, idx_dot long, pal_sum long"),
    )


def synth_jpeg_stage(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one REAL baseline JPEG per row (``jpeg.jpeg_encode``:
    forward DCT, flat-16 quantization, Annex-K Huffman coding, byte
    stuffing). Images are blockwise-constant with EVEN values — the
    one shape lossy JPEG reproduces exactly (DC-only blocks divide the
    flat quantizer) — so the decode side remains fully value-oracle-
    able: bw = 1 + id%3 and bh = 1 + (7·id)%4 blocks (w = 8·bw,
    h = 8·bh), block b's value = 2·((id·6151 + b·9173) mod 128)."""
    return fan_out(df).mapInPandas(
        _synth_jpeg_batches(id_col), schema="doc_id long, payload binary"
    )


def _synth_jpeg_batches(id_col: str):
    """Batch transform of :func:`synth_jpeg_stage` (exposed for the
    fused round trip — see :func:`_synth_png_batches`)."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml_hive_spark.operators.jpeg import jpeg_encode

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf[id_col]:
                did = int(did)
                bw, bh = 1 + did % 3, 1 + (did * 7) % 4
                b = np.arange(bh * bw, dtype=np.int64)
                vals = (2 * ((did * 6151 + b * 9173) % 128)).astype(np.uint8)
                px = np.kron(vals.reshape(bh, bw),
                             np.ones((8, 8), dtype=np.uint8))
                ids.append(did)
                payloads.append(jpeg_encode(px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return synth


def decode_jpeg_stage(df: DataFrame, id_col: str = "doc_id",
                      bin_col: str = "payload") -> DataFrame:
    """Full baseline-JPEG decode per row (``jpeg.jpeg_decode``: marker
    walk, canonical Huffman with unstuffing, dequant, inverse DCT)
    emitting dimensions and order-sensitive pixel checksums."""
    return df.mapInPandas(
        _decode_jpeg_batches(id_col, bin_col),
        schema="doc_id long, width int, height int, px_sum long, px_dot long",
    )


def _decode_jpeg_batches(id_col: str, bin_col: str):
    """Batch transform of :func:`decode_jpeg_stage`."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml_hive_spark.operators.jpeg import jpeg_decode

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "px_sum": [], "px_dot": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                img = jpeg_decode(bytes(payload))
                v = img.reshape(-1).astype(np.int64)
                i = np.arange(len(v), dtype=np.int64)
                out["doc_id"].append(int(did))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["px_sum"].append(int(v.sum()))
                out["px_dot"].append(int((i * v).sum()))
            yield pd.DataFrame(out)

    return decode


@query(
    "multimodal_jpeg_codec",
    oracle="""
SELECT s.doc_id, s.width, s.height,
       CAST(SUM(2 * ((s.doc_id * 6151
                 + (((t.i // s.width) // 8) * (s.width // 8)
                    + (t.i % s.width) // 8) * 9173) % 128)) AS BIGINT) AS px_sum,
       CAST(SUM(t.i * (2 * ((s.doc_id * 6151
                 + (((t.i // s.width) // 8) * (s.width // 8)
                    + (t.i % s.width) // 8) * 9173) % 128))) AS BIGINT) AS px_dot
FROM (
  SELECT doc_id,
         CAST(8 * (1 + doc_id % 3) AS INT) AS width,
         CAST(8 * (1 + (doc_id * 7) % 4) AS INT) AS height
  FROM documents
) s
CROSS JOIN range(0, 768) t(i)  -- 768 = max w*h = 24*32
WHERE t.i < s.width * s.height
GROUP BY s.doc_id, s.width, s.height
""",
    tags=("multimodal", "jpeg", "dct", "codec"),
)
def multimodal_jpeg_codec(spark: SparkSession, sf: str) -> DataFrame:
    """REAL baseline-JPEG round trip — Huffman entropy coding and the
    8×8 DCT both exercised for real — with a full SQL value oracle.
    JPEG is lossy, so the fixture images are blockwise-constant with
    even values: DC-only blocks survive flat-16 quantization exactly,
    making the decoded pixels a pure (doc_id, i) formula DuckDB can
    recompute codec-free while the codec itself does the full
    DCT/Huffman work. (General lossy content is covered by PSNR-floor
    tests in tests/test_jpeg_codec.py.) Completes the image-format
    set: PNG, GIF, and JPEG all decode through real codecs.

    r13: encode+decode fused in one mapInPandas — payloads never cross
    the Arrow/JVM boundary (see ``multimodal_png_codec``)."""
    docs = t(spark, sf, "documents").select("doc_id")
    synth = _synth_jpeg_batches("doc_id")
    decode = _decode_jpeg_batches("doc_id", "payload")
    return fan_out(docs).mapInPandas(
        lambda it: decode(synth(it)),
        schema="doc_id long, width int, height int, px_sum long, px_dot long",
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_checksum long, frame_bytes int"


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  bin_col: str = "payload", n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for video-shaped binary columns: one input
    row fans out to ``n_frames`` rows via mapInPandas (batch-granular
    fan-out, no JVM↔Python per-row chatter). The container header is
    parsed for real (``_pixel_planes``); frames are w×h pixel planes
    sampled evenly across the stream — ffmpeg keyframe seeking would
    replace only the plane extraction."""
    return df.mapInPandas(
        _sample_frames_batches(id_col, bin_col, n_frames), schema=FRAME_SCHEMA
    )


def _sample_frames_batches(id_col: str, bin_col: str, n_frames: int):
    """Batch transform of :func:`sample_frames`."""
    from typing import Iterator

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_checksum": [], "frame_bytes": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                _, _, planes = _pixel_planes(bytes(payload))
                if not planes:
                    continue
                # evenly spaced plane indices across the stream
                idxs = [
                    (i * len(planes)) // n_frames
                    for i in range(min(n_frames, len(planes)))
                ]
                for i, pi in enumerate(idxs):
                    frame = planes[pi].tobytes()
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    # portable 48-bit md5 content fingerprint (r9, was
                    # zlib.crc32 — no CRC32 in DuckDB, which kept the
                    # registry entry rows-only)
                    out["frame_checksum"].append(
                        int(hashlib.md5(frame).hexdigest()[:12], 16)
                    )
                    out["frame_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    return explode_frames


@query(
    "multimodal_frame_sample",
    oracle="""
WITH b AS (
  SELECT doc_id, text, length(text) AS L FROM documents
),
guard AS (
  SELECT CASE WHEN (SELECT count(*) FROM documents
                    WHERE length(text) = 0
                       OR strlen(text) <> length(text)) > 0
    THEN CAST('multimodal_frame_sample ORACLE DOMAIN ERROR: empty or '
              || 'non-ASCII text — the cyclic frame slice is replayed '
              || 'with char-indexed substr' AS BIGINT)
    ELSE 0 END AS ok
),
dims AS (
  SELECT doc_id, text, L,
         16 + (L % 48) AS w, 16 + ((L * 7) % 48) AS h
  FROM b WHERE (SELECT ok FROM guard) = 0
),
frames AS (
  SELECT d.doc_id, t.i AS frame_idx, d.w * d.h AS wh,
         substr(repeat(d.text, (d.w * d.h) // d.L + 2),
                ((2 * t.i * d.w * d.h) % d.L) + 1,
                d.w * d.h) AS fr
  FROM dims d CROSS JOIN range(0, 4) t(i)
)
SELECT CAST(frame_idx AS INT) AS frame_idx,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(wh) AS BIGINT) AS total_bytes,
       min(CAST('0x' || substr(md5(fr), 1, 12) AS BIGINT)) AS min_fp
FROM frames GROUP BY frame_idx ORDER BY frame_idx
""",
    tags=("multimodal", "binary", "fanout"),
)
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video-style frame sampling: docs → 8-plane containers with valid
    headers → header parse + evenly-spaced plane sample (4 of 8) →
    aggregate per frame position.

    FULL value oracle (r9 rows-only conversion): the frame checksum
    moved from zlib.crc32 (no CRC32 in DuckDB) to the portable 48-bit
    md5 fingerprint, and frame BYTES are reconstructible in SQL — the
    synth body is the text tiled cyclically (np.resize), so sampled
    plane 2i is the char-slice [(2i·wh) mod L, +wh) of the repeated
    text (char == byte under the ASCII corpus guard, which fails
    LOUDLY otherwise). Like the resize oracle, the twin never touches
    the container, so the driver hash covers the 8-plane make_image
    encode → header parse → plane-extract → even-sample round trip.

    r13: synth+sample fused in one mapInPandas — containers never
    cross the Arrow/JVM boundary (see ``multimodal_png_codec``)."""
    docs = t(spark, sf, "documents")
    synth = _synth_media_batches("doc_id", "payload", 8)
    sample = _sample_frames_batches("doc_id", "payload", 4)
    frames = fan_out(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    ).mapInPandas(lambda it: sample(synth(it)), schema=FRAME_SCHEMA)
    return (
        frames.groupBy("frame_idx")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("frame_bytes").alias("total_bytes"),
            F.min("frame_checksum").alias("min_fp"),
        )
        .orderBy("frame_idx")
    )


FEATURE_DIM = 16


def extract_byte_features(df: DataFrame, id_col: str = "doc_id",
                          bin_col: str = "payload") -> DataFrame:
    """Feature-extraction stage: a REAL (not stubbed) 16-bin byte
    histogram per payload, L2-normalized — the generic content signature
    that works on any binary modality. One numpy bincount per payload
    inside an Arrow batch; output is the standard ``array<float>``
    embedding shape, so it feeds the similarity/IVF operators directly."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for payload in pdf[bin_col]:
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                h = np.bincount(a >> 4, minlength=FEATURE_DIM).astype(np.float64)
                n = np.linalg.norm(h)
                vecs.append((h / n if n else h).astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "features": vecs})

    return df.mapInPandas(feats, schema="doc_id long, features array<float>")


@query(
    "multimodal_feature_extract",
    oracle="""
WITH b AS (
  SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents
),
guard AS (
  SELECT CASE WHEN (SELECT COALESCE(max(length(hx)), 0) FROM b) >= 2 * 4096
    THEN CAST('multimodal_feature_extract ORACLE DOMAIN ERROR: payload '
              || CAST((SELECT max(length(hx)) // 2 FROM b) AS VARCHAR)
              || ' bytes exceeds the range(4096) nibble sweep' AS BIGINT)
    ELSE 0 END AS ok
),
nib AS (
  SELECT b.doc_id, substr(b.hx, CAST(2*t.i + 1 AS BIGINT), 1) AS d
  FROM b CROSS JOIN range(0, 4096) t(i)
  WHERE t.i < length(b.hx) // 2
),
cnts AS (
  SELECT doc_id, d, CAST(count(*) AS BIGINT) AS c FROM nib GROUP BY doc_id, d
),
per AS (
  SELECT b.doc_id,
         sqrt(CAST(SUM(COALESCE(c.c * c.c, 0)) AS DOUBLE)) AS nrm,
         SUM(CASE WHEN c.d = '0' THEN c.c ELSE 0 END) AS c0,
         SUM(CASE WHEN c.d = '1' THEN c.c ELSE 0 END) AS c1,
         SUM(CASE WHEN c.d = '2' THEN c.c ELSE 0 END) AS c2,
         SUM(CASE WHEN c.d = '3' THEN c.c ELSE 0 END) AS c3
  FROM b LEFT JOIN cnts c USING (doc_id)
  GROUP BY b.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(floor(CAST(CAST(CASE WHEN nrm > 0 THEN COALESCE(c0,0)/nrm ELSE 0 END
      AS REAL) AS DOUBLE) * 1048576.0)) AS BIGINT) AS qsum_d0,
  CAST(SUM(floor(CAST(CAST(CASE WHEN nrm > 0 THEN COALESCE(c1,0)/nrm ELSE 0 END
      AS REAL) AS DOUBLE) * 1048576.0)) AS BIGINT) AS qsum_d1,
  CAST(SUM(floor(CAST(CAST(CASE WHEN nrm > 0 THEN COALESCE(c2,0)/nrm ELSE 0 END
      AS REAL) AS DOUBLE) * 1048576.0)) AS BIGINT) AS qsum_d2,
  CAST(SUM(floor(CAST(CAST(CASE WHEN nrm > 0 THEN COALESCE(c3,0)/nrm ELSE 0 END
      AS REAL) AS DOUBLE) * 1048576.0)) AS BIGINT) AS qsum_d3
FROM per WHERE (SELECT ok FROM guard) = 0
""",
    tags=("multimodal", "binary", "features"),
)
def multimodal_feature_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Binary → feature-vector pipeline, aggregated to a per-corpus
    centroid of the first 4 dimensions (quantized for stability).

    FULL value oracle (r9 rows-only conversion): the 16-bin HIGH-NIBBLE
    histogram is recomputable in SQL via hex() — hex digit 2i+1
    (1-indexed) of the payload IS byte i's high nibble, so per-bin
    counts are one unnest+GROUP BY away. The float chain is
    bit-reproducible cross-engine: integer counts are exact in float64,
    the norm is one IEEE sqrt of an exact integer sum of squares, the
    division is one correctly-rounded IEEE op, the float32 cast rounds
    half-even in both engines, and floor(f32→f64 × 2^20) is an exact
    exponent shift — the same determinism ladder dsum/pagerank use.
    Out-of-envelope payloads (> 4096 bytes) fail LOUDLY as an
    oracle-domain error, not a hash mismatch (bench-oracle guard
    pattern). Numpy-reference exactness stays pinned in
    tests/test_multimodal_extra.py."""
    docs = t(spark, sf, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    fv = extract_byte_features(with_payload)
    q20 = lambda c: F.floor(c.cast("double") * F.lit(1048576.0)).cast("long")  # noqa: E731
    return fv.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            (F.sum(q20(F.element_at("features", i + 1))) ).alias(f"qsum_d{i}")
            for i in range(4)
        ],
    )


RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, q_mean_px long, corner_px long"


def resize_images(df: DataFrame, out_w: int = 8, out_h: int = 8,
                  id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Resize stage: REAL header parse (``_pixel_planes`` — the image's
    actual w×h drive the pooling grid), then a REAL average-pool resize
    to ``out_w × out_h`` in numpy. ``PIL.Image.open`` would replace only
    the plane extraction inside ``_pixel_planes``.

    INTEGER-QUANTIZED pooling (r9, was a float64 mean-of-means): each
    block contributes ``block_sum * 2^20 // block_count`` (exact BIGINT
    — pixel sums are small ints), ``q_mean_px`` is the sum of the 64
    block quantities and ``corner_px`` is block (0,0)'s integer mean.
    Same fidelity for any ranking/monitoring use, but order-independent
    and bit-identical in every engine — numpy's pairwise float
    summation over non-integer block means was the one thing keeping
    this query rows-only."""
    return df.mapInPandas(
        _resize_images_batches(out_w, out_h, id_col, bin_col),
        schema=RESIZE_SCHEMA,
    )


def _resize_images_batches(out_w: int, out_h: int, id_col: str, bin_col: str):
    """Batch transform of :func:`resize_images`."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "out_w": [], "out_h": [], "q_mean_px": [],
                    "corner_px": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                w, h, planes = _pixel_planes(bytes(payload))
                if not planes:
                    continue
                img = planes[0].astype(np.int64)
                # real average-pool resize over the parsed h×w grid
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, w, out_w + 1).astype(int)
                q_mean = 0
                for i in range(out_h):
                    for j in range(out_w):
                        blk = img[ys[i]:ys[i+1], xs[j]:xs[j+1]]
                        if blk.size:
                            q_mean += int(blk.sum()) * 1048576 // blk.size
                c_blk = img[ys[0]:ys[1], xs[0]:xs[1]]
                corner = int(c_blk.sum()) // c_blk.size if c_blk.size else 0
                rows["doc_id"].append(did)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["q_mean_px"].append(q_mean)
                rows["corner_px"].append(corner)
            yield pd.DataFrame(rows)

    return resize


@query(
    "multimodal_resize_stub",
    oracle="""
WITH b AS (
  SELECT doc_id, upper(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS L
  FROM documents
),
dims AS (
  SELECT doc_id, hx, L, greatest(L, 1) AS le,
         16 + (greatest(L, 1) % 48) AS w,
         16 + ((greatest(L, 1) * 7) % 48) AS h
  FROM b
),
px AS (
  SELECT d.doc_id,
         (8 * (t.i // d.w) + 7) // d.h AS bi,
         (8 * (t.i % d.w) + 7) // d.w AS bj,
         CASE WHEN d.L = 0 THEN 0
              ELSE CAST('0x' || substr(d.hx, 2 * (t.i % d.le) + 1, 2) AS INT)
         END AS v
  FROM dims d CROSS JOIN range(0, 4096) t(i)
  WHERE t.i < d.w * d.h
),
blk AS (
  SELECT doc_id, bi, bj, CAST(sum(v) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS cnt
  FROM px GROUP BY doc_id, bi, bj
),
per AS (
  SELECT doc_id,
         CAST(SUM(s * 1048576 // cnt) AS BIGINT) AS q_mean_px,
         CAST(SUM(CASE WHEN bi = 0 AND bj = 0 THEN s // cnt ELSE 0 END)
              AS BIGINT) AS corner_px
  FROM blk GROUP BY doc_id
)
SELECT 8 AS out_w, 8 AS out_h, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(q_mean_px) AS BIGINT) AS qsum_mean_px,
       CAST(SUM(corner_px) AS BIGINT) AS sum_corner
FROM per
""",
    tags=("multimodal", "binary", "resize"),
)
def multimodal_resize_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Image-resize pipeline: valid containers → header-parsed dims →
    average-pool to 8×8, aggregated per output shape. (Name kept from
    earlier rounds for snapshot continuity; the decode is no longer a
    stub.)

    FULL value oracle (r9 rows-only conversion): the pooling was made
    integer-quantized (see ``resize_images``), so the whole pipeline is
    exact arithmetic on the payload bytes and the DuckDB twin recomputes
    it from FIRST PRINCIPLES — byte k of the text via the hex trick,
    synth dims w = 16 + L%48 / h = 16 + 7L%48, pixel (y,x) =
    byte[(y·w+x) mod L] (the np.resize tiling), pooling blocks via the
    verified integer inverse block(y) = (8y+7)//h of the linspace
    boundaries floor(i·h/8) (equivalence swept for every h in 16..63 in
    tests), block quantities S·2^20//n. The oracle never touches the
    container, so the driver hash verifies the make_image encode →
    header parse → plane-extract round trip end to end — the same
    codec-closure trick as the phash and decode-stub oracles.

    r13: synth+resize fused in one mapInPandas — containers never
    cross the Arrow/JVM boundary (see ``multimodal_png_codec``)."""
    docs = t(spark, sf, "documents")
    synth = _synth_media_batches("doc_id", "payload", 1)
    resize = _resize_images_batches(8, 8, "doc_id", "payload")
    rs = fan_out(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    ).mapInPandas(lambda it: resize(synth(it)), schema=RESIZE_SCHEMA)
    return (
        rs.groupBy("out_w", "out_h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q_mean_px").alias("qsum_mean_px"),
            F.sum("corner_px").alias("sum_corner"),
        )
        .orderBy("out_w")
    )


CHUNK_SCHEMA = "doc_id long, chunk_idx int, chunk binary, n_bytes int"


def chunk_payloads_arrow(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload",
    chunk_bytes: int = 128,
) -> DataFrame:
    """Fixed-size payload chunking via ``mapInArrow`` — the multipart
    layout stage for blob upload/storage. Unlike the pandas stages this
    one never materializes a pandas object: record batches come in and
    go out as Arrow, with Python touching only the buffer slices it
    emits. Batch-granular fan-out: one input batch → one output batch
    of all its chunks."""
    import pyarrow as pa

    def chunker(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1)
            out_id, out_idx, out_chunk, out_n = [], [], [], []
            for i in range(batch.num_rows):
                buf = payloads[i].as_py()
                pid = ids[i].as_py()
                if buf is None:
                    continue
                for ci, off in enumerate(range(0, max(len(buf), 1), chunk_bytes)):
                    piece = buf[off : off + chunk_bytes]
                    out_id.append(pid)
                    out_idx.append(ci)
                    out_chunk.append(piece)
                    out_n.append(len(piece))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_idx, pa.int32()),
                    pa.array(out_chunk, pa.binary()),
                    pa.array(out_n, pa.int32()),
                ],
                names=["doc_id", "chunk_idx", "chunk", "n_bytes"],
            )

    return df.mapInArrow(chunker, schema=CHUNK_SCHEMA)


@query(
    "multimodal_chunk_arrow",
    oracle="""
SELECT CAST(c.chunk_idx AS INTEGER) AS chunk_idx,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(least(128, len - c.chunk_idx * 128)) AS BIGINT) AS total_bytes
FROM (
  SELECT octet_length(CAST(text AS BLOB)) AS len FROM documents
), LATERAL (
  SELECT unnest(generate_series(0,
      CAST(ceil(len / 128.0) AS BIGINT) - 1)) AS chunk_idx
) c
GROUP BY 1 ORDER BY 1
""",
    tags=("multimodal", "binary", "mapinarrow"),
)
def multimodal_chunk_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """Chunk binary payloads into 128-byte parts Arrow-natively and
    aggregate the layout (chunks per index, bytes per index). The
    chunk sizes are pure arithmetic over payload lengths, so DuckDB
    derives the identical layout analytically — a full value oracle
    for a mapInArrow operator; byte-exact reassembly is pinned in
    tests/test_multimodal_extra.py."""
    docs = t(spark, sf, "documents")
    with_payload = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    chunks = chunk_payloads_arrow(with_payload)
    return (
        chunks.groupBy("chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy("chunk_idx")
    )
