"""XML source exercised through the query registry.

The reference's whole purpose is XML→table; this registry entry runs the
``xmlhive`` DataSource end-to-end on the repo's book-catalog fixture so
the driver's correctness run exercises the source path too (rows-only —
DuckDB has no XML reader to oracle against; golden-row assertions live in
tests/test_reader.py)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import query

_FIXTURE = Path(__file__).resolve().parent.parent.parent / "tests" / "fixtures" / "books"


@query("xml_scan_books", tags=("xml", "source"))
def xml_scan_books(spark: SparkSession, sf: str) -> DataFrame:
    """XSD-schema'd XML scan (reference capability A9-A19) + a relational
    query on top: genre rollup of the parsed catalog."""
    from xml_hive_spark.reader import read_xml

    df = read_xml(
        spark,
        str(_FIXTURE / "data.xml"),
        row_tag="book",
        xsd=_FIXTURE / "schema.xsd",
        sep_tag_type="bookType",
    )
    return (
        df.groupBy("genre")
        .agg(
            F.count(F.lit(1)).alias("n_books"),
            F.round(F.avg("price"), 2).alias("avg_price"),
            F.sum(F.size(F.coalesce("tag", F.array()))).alias("n_tags"),
        )
        .orderBy("genre")
    )
