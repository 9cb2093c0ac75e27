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


def all_queries() -> dict[str, QueryDef]:
    """Import every operator module (side effect: registration) and return
    the full registry."""
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
    return REGISTRY
