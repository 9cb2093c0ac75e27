"""Streaming MinHash near-duplicate detection — the online twin of the
batch banded-LSH dedup (operators/dedup.py): documents arrive in a
stream and each is flagged against everything that arrived BEFORE it,
the shape of a continuously-fed training-data pipeline (filter dups at
ingest, not in a nightly batch).

Plan shape (scale-first):

- a ``mapInPandas`` stage computes each document's MinHash band
  buckets executor-side (B rows per doc, ids + 8-byte buckets only —
  document text never enters the stateful shuffle);
- ``applyInPandasWithState`` keyed by ``(band, bucket)`` holds ONE
  number per occupied bucket (the smallest arrival seq seen) — state
  is O(distinct buckets), not O(documents), and a document is a hit in
  a bucket iff a strictly smaller seq reached that bucket first
  (same-micro-batch ties resolved by seq order inside the group);
- the per-doc verdict is an OR over its B band hits — a tiny batch
  aggregate over the drained sink.

The reference has no streaming surface at all; this composes two
extension tiers (streaming + near-dedup). Exactness oracle: the batch
twin (explode buckets → self-join on (band, bucket) with seq' < seq)
computes the identical dup set by definition, asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

import os
import uuid
import zlib
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from xml_hive_spark.operators import query
from xml_hive_spark.session import scratch_dir

_BANDS = 8
_ROWS = 2  # minhash rows per band → 16 permutations


def _minhash_buckets(text: str) -> list[int]:
    """One bucket per band from 3-word shingles (crc32 permutations —
    deterministic everywhere, no seed state). Short texts fall back to
    whole-text shingles so every doc occupies every band."""
    words = text.lower().split()
    shingles = (
        [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
        or [" ".join(words) or ""]
    )
    n_perm = _BANDS * _ROWS
    mins = [0xFFFFFFFF] * n_perm
    for s in shingles:
        base = zlib.crc32(s.encode())
        for j in range(n_perm):
            # j-th "permutation": crc of the shingle crc mixed with j
            h = zlib.crc32(j.to_bytes(2, "big"), base)
            if h < mins[j]:
                mins[j] = h
    out = []
    for b in range(_BANDS):
        seg = mins[b * _ROWS : (b + 1) * _ROWS]
        out.append(zlib.crc32(b"".join(m.to_bytes(4, "big") for m in seg)))
    return out


def band_bucket_stage(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(doc, seq) → B rows of (doc_id, seq, band, bucket); works
    identically on a batch or streaming DataFrame."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "seq": [], "band": [], "bucket": []}
            for did, seq, text in zip(pdf[id_col], pdf["seq"], pdf[text_col]):
                for band, bucket in enumerate(_minhash_buckets(str(text))):
                    out["doc_id"].append(int(did))
                    out["seq"].append(int(seq))
                    out["band"].append(band)
                    out["bucket"].append(bucket)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        fn, schema="doc_id long, seq long, band int, bucket long"
    )


_STATE = StructType([StructField("min_seq", LongType())])
_HIT = StructType([
    StructField("doc_id", LongType()),
    StructField("seq", LongType()),
    StructField("band", IntegerType()),
    StructField("hit", BooleanType()),
])


def _bucket_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    min_prev = state.get[0] if state.exists else None
    frames = list(pdfs)  # the iterator OBJECT is always truthy — test
    # the materialized list, or pd.concat([]) raises on an empty group
    if not frames:
        return
    rows = pd.concat(frames)
    if not len(rows):
        return
    rows = rows.sort_values("seq")
    out = {"doc_id": [], "seq": [], "band": [], "hit": []}
    cur = min_prev
    for did, seq, band in zip(rows["doc_id"], rows["seq"], rows["band"]):
        out["doc_id"].append(int(did))
        out["seq"].append(int(seq))
        out["band"].append(int(band))
        out["hit"].append(cur is not None and cur < int(seq))
        if cur is None or int(seq) < cur:
            cur = int(seq)
    state.update((int(cur),))
    yield pd.DataFrame(out)


def stage_ordered_documents(spark: SparkSession, sf_dir: str,
                            n_files: int = 3) -> str:
    """Documents split into ``n_files`` parquet files by doc_id range
    with ascending mtimes, so the file source replays them in arrival
    order (seq = doc_id). Test/demo scaffolding — a real landing dir
    already arrives in order."""
    from xml_hive_spark.operators import t as load

    out = scratch_dir("neardup-")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").alias("seq"), "text"
    )
    ids = list(docs.select(
        F.percentile_approx("doc_id", [i / n_files for i in range(1, n_files)],
                            10000).alias("q")).collect()[0][0])
    lo = None
    for i in range(n_files):
        hi = ids[i] if i < len(ids) else None
        part = docs
        if lo is not None:
            part = part.filter(F.col("doc_id") >= int(lo))
        if hi is not None:
            part = part.filter(F.col("doc_id") < int(hi))
        pdir = os.path.join(out, f"chunk={i}")
        part.coalesce(1).write.parquet(pdir)
        lo = hi
        for root, _, files in os.walk(pdir):
            for fn in files:
                os.utime(os.path.join(root, fn), (1_000_000 + i, 1_000_000 + i))
    return out


_STAGED = ("doc_id long, seq long, text string")


def run_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged ordered files → one micro-batch each → band buckets →
    stateful first-seq-wins per bucket → availableNow drain → per-doc
    OR of band hits."""
    raw = (
        spark.readStream.schema(_STAGED)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage_ordered_documents(spark, sf_dir))
    )
    hits = (
        band_bucket_stage(raw)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            _bucket_fn, _HIT, _STATE, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    name = f"stream_neardup_{uuid.uuid4().hex[:8]}"
    q = (
        hits.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("availableNow drain did not finish within 180s")
    return (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.max("hit").alias("is_dup"))
        .orderBy("doc_id")
    )


@query("streaming_dedup_minhash", tags=("streaming", "stateful", "dedup",
                                        "minhash"))
def streaming_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry (rows-only: arbitrary-state streaming isn't
    SQL-expressible; exact equality with the batch self-join twin is
    asserted in tests/test_streaming.py)."""
    return run_streaming_neardup(spark, sf)


def batch_neardup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground truth by definition: doc is a dup iff an earlier-seq doc
    shares any (band, bucket)."""
    from xml_hive_spark.operators import t as load

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").alias("seq"), "text"
    )
    bb = band_bucket_stage(docs).cache()
    earlier = bb.select(
        "band", "bucket", F.col("seq").alias("prev_seq")
    )
    dup_ids = (
        bb.join(earlier, ["band", "bucket"])
        .filter(F.col("prev_seq") < F.col("seq"))
        .select("doc_id")
        .distinct()
    )
    return (
        docs.join(dup_ids.withColumn("d", F.lit(True)), "doc_id", "left")
        .select("doc_id", F.coalesce("d", F.lit(False)).alias("is_dup"))
        .orderBy("doc_id")
    )
