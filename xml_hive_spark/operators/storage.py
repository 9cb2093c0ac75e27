"""Partitioned storage round-trip: Hive-style partitioned writes and
partition-pruned reads.

The reference's storage layer is read-only over whatever file layout
Hive gives it (one task per FileSplit, AvroFromXmlInputFormat.scala:
20-23) and its only sink is the test-harness Avro writer
(TestAvroTranformer.scala:53-66). A real lakehouse engine needs the
write side too: ``partitionBy`` directory layout so that selective
reads list only matching partitions — at 100 TB, partition pruning is
the difference between listing/reading one ``lang=en/`` subtree and
scanning the whole corpus. The pruning itself is Catalyst's
(PartitionFilters on the file index); the plan pin lives in
tests/test_plans.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import dsum, query, t

_ROUNDTRIP_DIR: dict[tuple, str] = {}


def partitioned_documents(spark: SparkSession, sf: str) -> DataFrame:
    """documents written once per (session, sf) as lang-partitioned
    parquet under the temp dir; returns the read-back DataFrame whose
    scans carry PartitionFilters for lang predicates."""
    key = (id(spark), sf)
    if key not in _ROUNDTRIP_DIR:
        out = os.path.join(
            tempfile.gettempdir(), f"xmlhive_part_docs_{abs(hash(sf)) % 10**8}"
        )
        (
            t(spark, sf, "documents")
            .repartition("lang")  # one task per partition dir: no
            # small-file explosion (N_tasks × N_langs files otherwise)
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(out)
        )
        _ROUNDTRIP_DIR[key] = out
    return spark.read.parquet(_ROUNDTRIP_DIR[key])


@query(
    "partitioned_write_roundtrip",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE lang = 'en'
GROUP BY source
ORDER BY source
""",
    tags=("sink", "partitioning", "pruning"),
)
def partitioned_write_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Write documents Hive-partitioned by lang, read back with a lang
    filter (pruned to the one partition directory), aggregate — the
    oracle runs the same aggregate on the original table, so the
    round-trip proves the partitioned sink loses nothing and the
    pruned read sees exactly the partition's rows."""
    docs = partitioned_documents(spark, sf)
    return (
        docs.filter(F.col("lang") == "en")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )
