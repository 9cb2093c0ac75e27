"""Streaming windowed aggregation over the events table.

Flow: file-source ``readStream`` (the landing-dir pattern — at scale this
is the bronze layer receiving micro-batches) → watermark → tumbling
window aggregate → ``availableNow`` trigger draining everything queued →
memory sink. ``availableNow`` gives exactly-once batch-equivalent
results, so the output is deterministic and testable against the batch
twin (``tumbling_window_agg``)."""

from __future__ import annotations

from xml_hive_spark.session import scratch_dir
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


from xml_hive_spark.operators import query
from xml_hive_spark.operators.scaleops import (
    HLL_EST_SQL,
    HLL_REG_SQL,
    HLL_RHO_SQL,
    HLL_SUM_SQL,
    hll_estimate_from_registers,
    hll_register_cols,
)


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table as an unbounded stream (file source over the sf dir).

    The stream schema is derived from the parquet footer via a throwaway
    batch read (streams require an explicit schema), then the ``ts``
    column is normalized exactly like the batch loader ``t()``: stored
    TIMESTAMP(NANOS) arrives as int64 nanos under the legacy conf and is
    floored to microseconds; stored timestamp[us] passes through
    unchanged. This keeps the stream byte-identical to its batch twin
    whichever layout the data files carry."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(schema["ts"].dataType, TimestampNTZType):
        # watermarks reject NTZ; value-exact under the UTC session tz
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def run_streaming_event_counts(
    spark: SparkSession, sf_dir: str, gap: str = "1 hour"
) -> DataFrame:
    """Run the tumbling-window count/sum as a real streaming query
    (watermark + window + availableNow) and return the drained result."""
    ev = streaming_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", gap).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", scratch_dir("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("availableNow drain did not finish within 120s")
    return spark.table(name)


@query(
    "streaming_window_counts",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""",
    tags=("streaming", "window"),
)
def streaming_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: the streaming pipeline end-to-end. FULL value
    oracle — the drain runs in COMPLETE mode over a finite input, so
    the emitted table is exactly the batch tumbling aggregate and the
    ``tumbling_window_agg`` oracle applies verbatim (count/decimal-sum
    are mergeable); the same equality is asserted against the batch
    twin in tests/test_streaming.py."""
    return run_streaming_event_counts(spark, sf)


def run_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication with a watermark:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only inside the
    watermark horizon (bounded state — the streaming twin of exact dedup;
    unbounded ``dropDuplicates`` state would grow forever at 100 TB/day).
    Keyed on the event's JSON payload value as a stand-in content key."""
    from pyspark.sql import functions as F

    ev = streaming_events(spark, sf_dir)
    keyed = ev.withColumn(
        "content_key", F.get_json_object("props", "$.k").cast("int")
    )
    deduped = (
        keyed.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["content_key"])
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("availableNow drain did not finish within 120s")
    return spark.table(name)


def run_streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-user count via the portable HLL sketch: the
    register table (reg → max rho) is a streaming aggregate in complete
    mode — max is mergeable, so state is bounded at 256 rows FOREVER,
    where streaming count(DISTINCT) is unsupported and
    dropDuplicates-then-count state grows with cardinality. The drained
    registers equal the batch registers exactly (availableNow), so the
    estimate admits a FULL DuckDB oracle — a value-checked streaming
    query, like streaming_static_join."""
    ev = streaming_events(spark, sf_dir)
    reg, rho = hll_register_cols(F.col("user_id").cast("string"))
    regs = (
        ev.select(reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("mx"))
    )
    name = f"stream_hll_{uuid.uuid4().hex[:8]}"
    q = (
        regs.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", scratch_dir("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("availableNow drain did not finish within 120s")
    return hll_estimate_from_registers(spark.table(name))


@query(
    "streaming_hll_distinct",
    oracle=f"""
WITH h AS (
  SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events
),
r AS (
  SELECT {HLL_REG_SQL} AS reg,
         {HLL_RHO_SQL} AS rho
  FROM h
),
m AS (
  SELECT reg, MAX(rho) AS mx FROM r GROUP BY reg
),
s AS (
  SELECT {HLL_SUM_SQL}
  FROM m
)
SELECT CAST(256 - zeros AS BIGINT) AS nonzero_registers,
       {HLL_EST_SQL} AS hll_est
FROM s
""",
    tags=("streaming", "sketch", "hll"),
)
def streaming_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: bounded-state streaming distinct-count. The
    256-row register aggregate is the ONLY streaming state; the final
    harmonic estimate runs batch-side over the drained memory table.
    Full value oracle (DuckDB recomputes the identical registers from
    the identical md5 hashes — availableNow makes the drain
    batch-equivalent); stream-equals-batch is additionally pinned in
    tests/test_streaming.py."""
    return run_streaming_hll(spark, sf)


def run_streaming_quantile_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming QUANTILE estimation with bounded state: the
    fixed-width histogram (value-cents DIV 100 → ≤ ~500 buckets on
    this value range) is a complete-mode streaming aggregate — counts
    are mergeable, so state is bounded by the value range / width
    FOREVER, where exact streaming percentiles would buffer every row.
    The drained histogram equals the batch histogram (availableNow),
    and the p50/p90/p99 bucket-floor reads are pure integer
    comparisons, so the whole streaming sketch admits a FULL DuckDB
    oracle — the quantile sibling of ``run_streaming_hll`` (same
    design: sketch state in the stream, estimate batch-side)."""
    ev = streaming_events(spark, sf_dir)
    hist = (
        ev.select(
            F.expr(
                "CAST(round(value * 100) AS BIGINT) DIV 100"
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    name = f"stream_qhist_{uuid.uuid4().hex[:8]}"
    q = (
        hist.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", scratch_dir("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("availableNow drain did not finish within 120s")
    from pyspark.sql import Window

    b = spark.table(name)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    total = b.agg(F.sum("n").alias("total"))
    c = b.select(
        "bucket", "n", F.sum("n").over(w).alias("cum")
    ).crossJoin(F.broadcast(total))

    def floor_at(num: int, den: int, alias: str):
        return (
            F.min(
                F.when(
                    F.col("cum") * den >= F.col("total") * num,
                    F.col("bucket"),
                )
            )
            * 100
        ).cast("long").alias(alias)

    return c.agg(
        floor_at(1, 2, "p50_floor_cents"),
        floor_at(9, 10, "p90_floor_cents"),
        floor_at(99, 100, "p99_floor_cents"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )


@query(
    "streaming_quantile_histogram",
    oracle="""
WITH b AS (
  SELECT CAST(round(value * 100) AS BIGINT) // 100 AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY bucket
),
c AS (
  SELECT bucket, n,
         SUM(n) OVER (ORDER BY bucket) AS cum,
         (SELECT SUM(n) FROM b) AS total
  FROM b
)
SELECT CAST((SELECT MIN(bucket) FROM c
             WHERE cum * 2 >= total) * 100 AS BIGINT) AS p50_floor_cents,
       CAST((SELECT MIN(bucket) FROM c
             WHERE cum * 10 >= total * 9) * 100 AS BIGINT)
         AS p90_floor_cents,
       CAST((SELECT MIN(bucket) FROM c
             WHERE cum * 100 >= total * 99) * 100 AS BIGINT)
         AS p99_floor_cents,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_buckets
""",
    tags=("streaming", "sketch", "quantile", "histogram"),
)
def streaming_quantile_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: bounded-state streaming quantiles (see
    :func:`run_streaming_quantile_histogram`). Full value oracle —
    DuckDB recomputes the identical integer histogram and bucket-floor
    reads; stream-equals-batch is additionally pinned in
    tests/test_streaming.py."""
    return run_streaming_quantile_histogram(spark, sf)


def run_streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC bar construction: open/close ride min_by/max_by
    over the bar-relative unique ordering value (the batch
    ``ohlc_bars_hourly`` convention) — all four OHLC aggregates are
    MERGEABLE, so complete-mode state is |series|×|hours| rows and the
    drained bars equal the batch bars exactly (availableNow), giving a
    streaming query a FULL value oracle."""
    ev = streaming_events(spark, sf_dir)
    ordv = (
        F.unix_micros("ts") - F.unix_micros(F.date_trunc("hour", "ts"))
    ) * 2147483648 + F.col("event_id")
    bars = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("bar"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            ordv.alias("ord"),
        )
        .groupBy("event_type", "bar")
        .agg(
            F.expr("min_by(cents, ord)").cast("long").alias("open_cents"),
            F.max("cents").cast("long").alias("high_cents"),
            F.min("cents").cast("long").alias("low_cents"),
            F.expr("max_by(cents, ord)").cast("long").alias("close_cents"),
            F.count(F.lit(1)).cast("long").alias("n_ticks"),
        )
    )
    name = f"stream_ohlc_{uuid.uuid4().hex[:8]}"
    q = (
        bars.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", scratch_dir("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("availableNow drain did not finish within 120s")
    return spark.table(name).orderBy("event_type", "bar")


@query(
    "streaming_ohlc_bars",
    oracle="""
WITH pricks AS (
  SELECT event_type,
         date_trunc('hour', ts) AS bar,
         CAST(round(value * 100) AS BIGINT) AS cents,
         (epoch_us(ts) - epoch_us(date_trunc('hour', ts))) * 2147483648
           + event_id AS ord
  FROM events
)
SELECT event_type, bar,
       CAST(min_by(cents, ord) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(max_by(cents, ord) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM pricks
GROUP BY event_type, bar
ORDER BY event_type, bar
""",
    tags=("streaming", "ohlc", "finance"),
)
def streaming_ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: streaming OHLC bars with bounded complete-mode
    state (see :func:`run_streaming_ohlc`); full value oracle — the
    batch ``ohlc_bars_hourly`` oracle applies verbatim because every
    OHLC aggregate is mergeable and availableNow drains
    batch-equivalently."""
    return run_streaming_ohlc(spark, sf)
