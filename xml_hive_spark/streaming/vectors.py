"""Streaming VECTOR ingest: embeddings arriving as files are assigned
to their nearest IVF centroid in-flight — the write path of a live ANN
index (the read path is ``operators/ann_index.py``'s persisted
build/search split): at 100 TB a vector corpus is not re-clustered per
batch; new vectors are routed to the EXISTING coarse structure and the
per-list counts (the index's fill-factor telemetry) update as a
bounded complete-mode aggregate (k rows forever).

Rows-only by design: the centroids come from seeded k-means (not
SQL-expressible — the ``cosine_topk_ivf_kmeans`` adjudication);
stream-equals-batch assignment is pinned exactly in
tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, t
from xml_hive_spark.session import scratch_dir


def stage_embedding_chunks(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> str:
    """Write the embeddings table into n parquet files in a landing dir
    (the at-least-once file-arrival pattern of the other streaming
    harnesses)."""
    landing = scratch_dir("vec-landing-")
    emb = t(spark, sf_dir, "embeddings")
    emb.repartition(n_files).write.mode("overwrite").parquet(landing)
    return landing


def assign_clusters(df: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Nearest-centroid assignment as an Arrow-batched pandas UDF over
    the broadcast (k, dim) centroid matrix — one einsum per batch.

    The index's centroids are 2^20-QUANTIZED INTEGERS since r9, so the
    incoming vectors are quantized to the SAME scale before the
    Euclidean argmin — mixing unit-scale floats with 2^20-scale
    centroids would let the ||c||^2 term dominate and degenerate the
    routing to argmin-by-centroid-magnitude (caught in the r9 review of
    the integer-centroid change; the stream-equals-batch twin shares
    this function, so only a metric-level check could see it). All
    integer arithmetic -> assignment is exact and
    parallelism-independent."""
    from pyspark.sql.functions import pandas_udf

    from xml_hive_spark.operators.similarity import _quantize20

    c = np.asarray(centroids, dtype=np.int64)
    c_norm2 = (c * c).sum(axis=1)

    @pandas_udf("int")
    def nearest(col: pd.Series) -> pd.Series:
        x = _quantize20(np.stack(col.to_numpy()).astype(np.float64))
        d = c_norm2[None, :] - 2 * (x @ c.T)  # + ||x||² is rank-free
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return df.withColumn("cluster", nearest(F.col("embedding")))


def run_streaming_vector_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from xml_hive_spark.operators.ann_index import ivf_pq_index

    idx = ivf_pq_index(spark, sf_dir)
    landing = stage_embedding_chunks(spark, sf_dir)
    schema = t(spark, sf_dir, "embeddings").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(landing)
    )
    counts = (
        assign_clusters(stream, idx.centroids)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.min("vec_id").cast("long").alias("min_vec_id"),
        )
    )
    name = f"vec_ingest_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", scratch_dir("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("availableNow drain did not finish within 180s")
    return spark.table(name)


@query("streaming_vector_ingest",
       tags=("streaming", "ann", "ivf", "ingest"))
def streaming_vector_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: streaming nearest-centroid routing into the
    persisted IVF structure with bounded complete-mode state (k rows);
    see module docstring. Stream-equals-batch pinned in tests."""
    return run_streaming_vector_ingest(spark, sf)
