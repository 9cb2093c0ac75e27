"""Structured Streaming: the streaming windowed aggregate must equal its
batch twin (same window expression, availableNow drain)."""

from __future__ import annotations

from xml_hive_spark.operators import all_queries
from xml_hive_spark.streaming import run_streaming_event_counts


def test_streaming_equals_batch(spark, sf_dir):
    stream_df = run_streaming_event_counts(spark, sf_dir)
    batch_df = all_queries()["tumbling_window_agg"].fn(spark, sf_dir)
    s = sorted(
        (r.window_start, r.event_type, r.n, round(r.sum_value, 6))
        for r in stream_df.collect()
    )
    b = sorted(
        (r.window_start, r.event_type, r.n, round(r.sum_value, 6))
        for r in batch_df.collect()
    )
    assert s == b
    assert len(s) > 0
