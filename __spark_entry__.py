"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``xml_hive_spark.operators`` (registry
populated by the operator modules; SURVEY.md §2 coverage).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from xml_hive_spark.operators import all_queries

    return all_queries()["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from xml_hive_spark.operators import all_queries

    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; the 3
    omitted keys (Spark-internal HLL++/percentile sketches and the
    64-d eigendecomposition) get the driver's rows-only check, with
    their own assertions in tests/ — the exact list is pinned in
    tests/test_operators.py::test_registry_complete."""
    from xml_hive_spark.operators import all_queries

    return {
        name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None
    }
