"""Filter pushdown for the ``xmlhive`` DataSource (Spark 4.1
``pushFilters``): accepted filters are fully handled by the source —
Spark does NOT re-apply them — so the compiled predicates must match
SQL three-valued semantics exactly. The reference has no predicate
interface at all (Hive filters post-deserialization, SURVEY.md §4.1);
this is a genuine capability our scan adds.

Strategy: (a) unit-test the filter compiler's null/Not/In semantics,
(b) end-to-end: every supported filter shape applied through
``spark.read.format("xmlhive")`` must equal the same ``.filter`` over a
parquet round-trip of the identical rows (Catalyst's own evaluation as
the oracle), on both the flat Arrow fast path and the nested exact
path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    In,
    IsNotNull,
    IsNull,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from xml_hive_spark.sources.pushdown import compile_conjunction, compile_filter

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True,
                    metadata={"xmlKind": "attribute", "xmlName": "id"}),
        StructField("name", StringType(), True,
                    metadata={"xmlKind": "element", "xmlName": "name"}),
        StructField("score", DoubleType(), True,
                    metadata={"xmlKind": "element", "xmlName": "score"}),
    ]
)


class TestCompiler:
    def test_equal_to_null_is_sql_null(self):
        p = compile_filter(EqualTo(("name",), "a"), SCHEMA)
        assert p((1, "a", 2.0)) is True
        assert p((1, "b", 2.0)) is False
        assert p((1, None, 2.0)) is None  # NULL, not False

    def test_not_preserves_null(self):
        p = compile_filter(Not(EqualTo(("name",), "a")), SCHEMA)
        assert p((1, "b", 0.0)) is True
        assert p((1, "a", 0.0)) is False
        # NOT(NULL = 'a') is NULL → the row must still be dropped
        assert p((1, None, 0.0)) is None

    def test_in_with_null_element(self):
        p = compile_filter(In(("id",), (1, 2, None)), SCHEMA)
        assert p((1, "x", 0.0)) is True
        assert p((3, "x", 0.0)) is None  # no match + NULL element → NULL
        q = compile_filter(In(("id",), (1, 2)), SCHEMA)
        assert q((3, "x", 0.0)) is False

    def test_null_safe_eq(self):
        p = compile_filter(EqualNullSafe(("name",), None), SCHEMA)
        assert p((1, None, 0.0)) is True
        assert p((1, "a", 0.0)) is False

    def test_is_null_not_null(self):
        assert compile_filter(IsNull(("score",)), SCHEMA)((1, "a", None)) is True
        assert compile_filter(IsNotNull(("score",)), SCHEMA)((1, "a", None)) is False

    def test_string_ops(self):
        assert compile_filter(StringStartsWith(("name",), "ab"), SCHEMA)(
            (1, "abc", 0.0)) is True
        assert compile_filter(StringEndsWith(("name",), "bc"), SCHEMA)(
            (1, "abc", 0.0)) is True
        assert compile_filter(StringContains(("name",), "zz"), SCHEMA)(
            (1, "abc", 0.0)) is False

    def test_nan_ordering_matches_spark(self):
        # Spark sorts NaN greater than any double and NaN == NaN
        gt = compile_filter(GreaterThan(("score",), 1e308), SCHEMA)
        assert gt((1, "a", float("nan"))) is True
        le = compile_filter(LessThanOrEqual(("score",), 0.0), SCHEMA)
        assert le((1, "a", float("nan"))) is False
        eq = compile_filter(EqualTo(("score",), 1.0), SCHEMA)
        assert eq((1, "a", float("nan"))) is False
        # NaN literal: stays with Spark
        assert compile_filter(EqualTo(("score",), float("nan")), SCHEMA) is None

    def test_unsupported_shapes_rejected(self):
        nested = StructType([StructField("a", SCHEMA, True)])
        assert compile_filter(EqualTo(("a", "name"), "x"), nested) is None
        assert compile_filter(EqualTo(("missing",), 1), SCHEMA) is None
        arr = StructType([StructField("xs", ArrayType(IntegerType()), True)])
        assert compile_filter(EqualTo(("xs",), [1]), arr) is None

    def test_conjunction_requires_all_true(self):
        preds = [
            compile_filter(IsNotNull(("name",)), SCHEMA),
            compile_filter(GreaterThan(("id",), 0), SCHEMA),
        ]
        keep = compile_conjunction(preds)
        assert keep((1, "a", 0.0)) is True
        assert keep((0, "a", 0.0)) is False
        assert keep((None, "a", 0.0)) is False  # NULL comparison → drop


FLAT_XML = b"\n".join(
    [b"<catalog>"]
    + [
        b'<row id="%d"><name>%s</name><score>%s</score></row>'
        % (i, name, score)
        for i, name, score in [
            (1, b"alpha", b"1.5"),
            (2, b"beta", b"2.5"),
            (3, b"gamma", b""),  # score null
            (4, b"", b"4.0"),  # name empty string
            (5, b"delta&amp;co", b"5.25"),
        ]
    ]
    + [b'<row id="6"><score>0.5</score></row>', b"</catalog>"]  # name null
)

NESTED_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True,
                    metadata={"xmlKind": "attribute", "xmlName": "id"}),
        StructField("name", StringType(), True,
                    metadata={"xmlKind": "element", "xmlName": "name"}),
        StructField("score", DoubleType(), True,
                    metadata={"xmlKind": "element", "xmlName": "score"}),
        # array field disqualifies FlatAssembler → exact ET path
        StructField("tags", ArrayType(StringType()), True,
                    metadata={"xmlKind": "element", "xmlName": "tag"}),
    ]
)

def _conditions():
    return [
        F.col("id") > 2,
        F.col("name") == "alpha",
        F.col("name") != "alpha",  # Not(EqualTo): null name must drop
        F.col("score").isNull(),
        F.col("score").isNotNull() & (F.col("score") <= 2.5),
        F.col("name").startswith("a") | F.col("name").endswith("ta"),  # OR: not pushed
        F.col("name").contains("lt"),
        F.col("id").isin(2, 4, 6),
        F.col("name").eqNullSafe(None),
        (F.col("id") % 2 == 1),  # arithmetic: unsupported, Spark post-filters
    ]


def _xml_df(spark, tmp_path, schema):
    from xml_hive_spark.reader import read_xml

    p = tmp_path / "data.xml"
    p.write_bytes(FLAT_XML)
    return read_xml(spark, str(p), "row", schema=schema)


@pytest.mark.parametrize("schema", [SCHEMA, NESTED_SCHEMA],
                         ids=["flat-arrow-path", "exact-et-path"])
def test_pushdown_equals_catalyst(spark, tmp_path, schema):
    xml = _xml_df(spark, tmp_path, schema)
    # parquet round-trip of the SAME rows: Catalyst evaluates every
    # condition itself there — the semantics oracle
    pq = str(tmp_path / f"oracle-{len(schema)}.parquet")
    xml.write.mode("overwrite").parquet(pq)
    oracle = spark.read.parquet(pq)
    assert xml.count() == 6
    for cond in _conditions():
        got = sorted(r["id"] for r in xml.filter(cond).select("id").collect())
        want = sorted(r["id"] for r in oracle.filter(cond).select("id").collect())
        assert got == want, f"filter {cond} pushed={got} oracle={want}"


def test_reader_accepts_and_returns_by_reference(tmp_path):
    from xml_hive_spark.sources.xml_datasource import XmlHiveReader

    p = tmp_path / "d.xml"
    p.write_bytes(FLAT_XML)
    reader = XmlHiveReader(SCHEMA, {"rowtag": "row", "path": str(p)})
    supported = EqualTo(("name",), "alpha")
    unsupported = EqualTo(("nope",), 1)
    leftover = list(reader.pushFilters([supported, unsupported]))
    assert leftover == [unsupported] and leftover[0] is unsupported
    assert len(reader._pushed) == 1
    rows = [r for part in reader.partitions() for r in reader.read(part)]
    # flat path yields Arrow batches; count rows across shapes
    n = sum(b.num_rows if hasattr(b, "num_rows") else 1 for b in rows)
    assert n == 1  # only the name='alpha' record survived the scan


def test_date_typed_filters_compile_and_compare():
    """Rich-types reader schemas carry DateType fields; date literals
    from Spark arrive as datetime.date and must compare correctly."""
    from datetime import date

    from pyspark.sql.types import DateType

    sch = StructType([StructField("d", DateType(), True)])
    p = compile_filter(GreaterThan(("d",), date(2024, 1, 15)), sch)
    assert p((date(2024, 2, 1),)) is True
    assert p((date(2024, 1, 1),)) is False
    assert p((None,)) is None
    q = compile_filter(In(("d",), (date(2024, 1, 1), date(2024, 1, 2))), sch)
    assert q((date(2024, 1, 2),)) is True
    assert q((date(2024, 3, 3),)) is False
