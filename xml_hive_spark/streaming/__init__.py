"""Structured Streaming surface.

The reference is batch-only (``FileInputFormat``,
AvroFromXmlInputFormat.scala:15); streaming is part of this engine's
extension scope (SURVEY.md §2.B last row, §7 M6). The batch twins of
these operators (same ``F.window`` / ``session_window`` expressions) live
in ``operators/timeseries.py`` with DuckDB oracles; here the same plans
run under ``readStream`` → ``writeStream``, proven equal to batch in
tests/test_streaming.py.
"""

from xml_hive_spark.streaming.windowed import (  # noqa: F401
    run_streaming_event_counts,
    streaming_events,
)
