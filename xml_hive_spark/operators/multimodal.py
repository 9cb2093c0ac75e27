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
