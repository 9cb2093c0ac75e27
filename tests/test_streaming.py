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


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """Watermarked streaming dedup: emitted rows have unique content keys
    within any watermark window; total is bounded by the batch distinct
    count (the stream may emit more than the global distinct because keys
    can legally reappear after the watermark expires their state)."""
    from xml_hive_spark.streaming.windowed import run_streaming_dedup

    out = run_streaming_dedup(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    from xml_hive_spark.operators import t
    from pyspark.sql import functions as F

    ev = t(spark, sf_dir, "events")
    n_events = ev.count()
    n_distinct = (
        ev.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .distinct()
        .count()
    )
    # dedup must remove something, and can't go below the true distinct
    assert n_distinct <= len(rows) < n_events
