"""Determinism-under-parallelism pin: every oracled query's result is a
pure function of the data — never of partitioning, shuffle fan-out, or
AQE decisions. The driver compares one run against DuckDB; this pins
that a DIFFERENT cluster shape produces the identical rows (the
property that makes results reproducible across cluster resizes at
100 TB). A representative query per shuffle-shape family."""

from __future__ import annotations

import pytest

from xml_hive_spark.operators import all_queries

REPRESENTATIVES = [
    "sample_stratified_exact",   # hash-ranked window quota
    "sketch_kmv_distinct",       # bottom-k order statistics
    "event_pattern_match",       # order-sensitive per-key aggregation
    "dedup_incremental_ingest",  # multi-join classification
    "corpus_curation_pipeline",  # 4-stage composed pipeline
    "sketch_quantile_histogram", # global cumulative walk
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_same_rows_under_different_parallelism(spark, sf_dir, name):
    fn = all_queries()[name].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        high = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high
