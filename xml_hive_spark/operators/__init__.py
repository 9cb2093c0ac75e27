"""Operator/query registry.

The reference delivers its relational surface by delegating to Hive via
SerDe inheritance (AvroFromXmlSerde.scala:13); our engine's delegation
target is Catalyst. Every capability row of SURVEY.md §2.B is exercised
here as a registered query with (where SQL-expressible) a DuckDB oracle —
the driver contract's correctness gate.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable. Computed
columns are aliased identically in the Spark code and the oracle SQL so
the driver's sorted-by-name value hash lines up.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    tags: tuple[str, ...]


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, tags)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver parquet table (TESTDATA.md).

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark's parquet
    reader rejects; read it as int64 nanos (legacy conf) and convert to a
    microsecond timestamp (floor division — the same truncation DuckDB
    applies when it narrows ns→us)."""
    if name == "events":
        from pyspark.sql import functions as F

        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(raw.schema["ts"].dataType, LongType):
            # integer DIV, not /: epoch-nanos (~1.7e18) exceeds double's
            # exact integer range — float division would round the microsecond
            raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return raw
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col, scale: int = 2):
    """Order-independent cross-engine SUM of doubles: cast each addend to
    DECIMAL(30,6) (exact, associative); the final decimal→double conversion
    is IEEE-correct in both engines, so Spark and DuckDB agree bit-for-bit
    with NO final rounding (rounding would reintroduce half-boundary
    divergence — the engines round doubles differently). SQL twin:
    ``CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE)``."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(30,6)")).cast("double")


def davg(col, scale: int = 4):
    """Deterministic AVG via decimal sum / count (IEEE division of
    identical operands — bit-for-bit equal). SQL twin:
    ``CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / count(*)``."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(30,6)")).cast("double") / F.count(F.lit(1))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        t(spark, sf_dir, n).createOrReplaceTempView(n)


_LOADED = False

# Driver-window rotation (round 3). The verify driver snapshots correctness
# for only the FIRST 50 registry entries (dict order); rounds 1-2 checked a
# nearly identical window, leaving 65 queries with local-gate-only coverage.
# This list pins the round-3 window to 50 oracled, never-driver-checked
# queries. Rotation plan (see README "Correctness rotation"): round 4 should
# promote the remaining never-checked entries (set_intersect_all,
# set_except_all, json_construction, date_arithmetic, the rows-only
# XML/ANN/streaming entries, plus anything added in round 3) and re-seat a
# sample of previously green queries.
_DRIVER_WINDOW = [
    # TPC-H shapes never driver-checked (13)
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q20_heavy_supplier_chain",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # relational surface (oracled, never checked)
    "scalar_subquery_ratio",
    "pivot_status_counts",
    "unpivot_part_metrics",
    "conditional_functions",
    "string_predicates",
    "sort_within_partitions",
    "apply_in_pandas_centered",
    "from_json_struct",
    "map_functions",
    "salted_join_agg",
    "agg_percentiles",
    "variant_json_access",
    "window_range_frame",
    "window_value_functions",
    "explode_outer_empty_arrays",
    "agg_grouping_id",
    "array_higher_order",
    # similarity / embeddings
    "cosine_topk_bruteforce",
    "embedding_label_centroids",
    # storage round-trips
    "partitioned_write_roundtrip",
    "csv_roundtrip",
    "json_roundtrip",
    # text analysis + LLM text-prep
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "source_stats",
    "text_clean_normalize",
    "vocab_topk",
    "pack_sequences",
    "doc_chunks_udtf",
    "quality_filter_verdicts",
    # time-series
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "asof_join",
    "hypertable_rollup",
]


def all_queries() -> dict[str, QueryDef]:
    """Import every operator module (side effect: registration) and return
    the full registry, reordered so the driver's 50-entry correctness
    window lands on :data:`_DRIVER_WINDOW`."""
    global _LOADED
    if not _LOADED:
        from xml_hive_spark.operators import (  # noqa: F401
            dedup,
            multimodal,
            relational,
            relational2,
            relational3,
            relational4,
            similarity,
            storage,
            text,
            textprep,
            timeseries,
            xmlio,
        )
        from xml_hive_spark.streaming import joins, stateful, windowed  # noqa: F401

        _LOADED = True
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # a rename would silently shrink the checked window
        raise KeyError(f"_DRIVER_WINDOW names not in registry: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, qd) for n, qd in REGISTRY.items() if n not in ordered)
    return ordered
