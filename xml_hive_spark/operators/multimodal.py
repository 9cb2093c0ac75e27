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
