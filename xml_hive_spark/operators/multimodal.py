"""Multimodal-column plumbing (BASELINE.md north_star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract run as Arrow-batched ``mapInPandas``
stages. The container has no codec libraries, so the decode kernel is a
clearly-marked deterministic stub (``_fake_decode``) behind the same
Spark-side plumbing (schema, batching, partitioning) a real decoder would
use — swap ``_fake_decode`` for a PIL/ffmpeg call and nothing else
changes.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, t

DECODE_SCHEMA = (
    "doc_id long, byte_len int, checksum long, width int, height int, format string"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder.

    A real implementation would be::

        from PIL import Image
        img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, ...}

    No codec libs in this container → derive stable fake dimensions from
    the payload checksum instead."""
    crc = zlib.crc32(payload)
    return {
        "byte_len": len(payload),
        "checksum": crc,
        "width": 64 + (crc % 1024),
        "height": 64 + ((crc >> 10) % 1024),
        "format": ("png", "jpeg", "webp")[crc % 3],
    }


def decode_binary_metadata(df: DataFrame, id_col: str = "doc_id",
                           bin_col: str = "payload") -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over (id, binary) batches.
    Batch shape = Arrow record batches; per-batch Python cost is one loop
    over payloads, no JVM↔Python per-row chatter."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(p) for p in pdf[bin_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)


@query("multimodal_decode_stub", tags=("multimodal", "binary", "mapinpandas"))
def multimodal_decode_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column pipeline: text → binary payload column (stand-in for
    stored image bytes) → mapInPandas decode → typed metadata → aggregate.
    Deterministic (checksum-derived fake dims) → stable rows-only check."""
    docs = t(spark, sf, "documents")
    with_payload = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    meta = decode_binary_metadata(with_payload)
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


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_checksum long, frame_bytes int"


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  bin_col: str = "payload", n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for video-shaped binary columns: one input row
    fans out to ``n_frames`` rows via mapInPandas (batch-granular fan-out,
    no JVM↔Python per-row chatter). The frame extraction itself is a
    deterministic stub (payload slicing + crc) — a real implementation
    would seek keyframes with ffmpeg; the Spark-side contract (schema,
    fan-out shape, partition locality) is identical."""
    import zlib
    from typing import Iterator

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_checksum": [], "frame_bytes": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    chunk = payload[i * step : (i + 1) * step]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    out["frame_checksum"].append(zlib.crc32(chunk))
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return df.mapInPandas(explode_frames, schema=FRAME_SCHEMA)


@query("multimodal_frame_sample", tags=("multimodal", "binary", "fanout"))
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video-style frame sampling over binary payloads: 4 frames per doc,
    aggregated per frame position. Deterministic (checksum-based stub) →
    stable rows-only check."""
    docs = t(spark, sf, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    frames = sample_frames(with_payload)
    return (
        frames.groupBy("frame_idx")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("frame_bytes").alias("total_bytes"),
            F.min("frame_checksum").alias("min_crc"),
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


@query("multimodal_feature_extract", tags=("multimodal", "binary", "features"))
def multimodal_feature_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Binary → feature-vector pipeline, aggregated to a per-corpus
    centroid of the first 4 dimensions (quantized for stability).
    Deterministic end to end — rows-only check, exactness pinned in
    tests/test_multimodal_extra.py against a numpy reference."""
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


RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, mean_px double, corner_px long"


def resize_images(df: DataFrame, out_w: int = 8, out_h: int = 8,
                  id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Resize stage: decode (stubbed — no codec libs in this container;
    the deterministic fake expands payload bytes into a pixel grid) then
    a REAL average-pool resize to ``out_w × out_h`` in numpy. Swapping
    the fake grid for ``PIL.Image.open`` output changes nothing outside
    the marked line."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "out_w": [], "out_h": [], "mean_px": [],
                    "corner_px": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                side = max(int(len(raw) ** 0.5), out_w)
                # STUB decode: tile payload bytes into a side×side grid
                # (real: np.asarray(PIL.Image.open(io.BytesIO(payload))))
                img = np.resize(raw, (side, side)).astype(np.float64)
                # real average-pool resize
                ys = np.linspace(0, side, out_h + 1).astype(int)
                xs = np.linspace(0, side, out_w + 1).astype(int)
                pooled = np.array(
                    [[img[ys[i]:ys[i+1], xs[j]:xs[j+1]].mean()
                      for j in range(out_w)] for i in range(out_h)]
                )
                rows["doc_id"].append(did)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["mean_px"].append(float(np.floor(pooled.mean() * 1048576.0)))
                rows["corner_px"].append(int(pooled[0, 0]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(resize, schema=RESIZE_SCHEMA)


@query("multimodal_resize_stub", tags=("multimodal", "binary", "resize"))
def multimodal_resize_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Image-resize pipeline over binary payloads (stub decode + real
    pooling), aggregated per output shape. Deterministic → rows-only."""
    docs = t(spark, sf, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    rs = resize_images(with_payload)
    return (
        rs.groupBy("out_w", "out_h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("mean_px").cast("long").alias("qsum_mean_px"),
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
