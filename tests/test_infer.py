"""Sampled schema inference (infer.py): reading XML with no XSD at all —
a capability the reference lacks entirely (xml.schema.location is
mandatory there). Inferred reads must agree with XSD-declared reads on
the shared fixtures, and the type lattice must be conservative."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructType,
)

from xml_hive_spark.infer import infer_xml_schema

FIXTURES = Path(__file__).resolve().parent / "fixtures"


class TestInferenceShapes:
    def test_books_fixture_types(self):
        s = infer_xml_schema(FIXTURES / "books" / "data.xml", "book")
        by_name = {f.name: f for f in s.fields}
        assert by_name["id"].metadata.get("xmlKind") == "attribute"
        assert isinstance(by_name["id"].dataType, StringType)
        assert isinstance(by_name["price"].dataType, DoubleType)
        assert isinstance(by_name["author"].dataType, StringType)
        # publish_date parses as neither bool/long/double → string
        assert isinstance(by_name["publish_date"].dataType, StringType)
        # repeated <tag> elements → array
        assert isinstance(by_name["tag"].dataType, ArrayType)
        assert isinstance(by_name["tag"].dataType.elementType, StringType)

    def test_lattice_and_nesting(self, tmp_path):
        p = tmp_path / "x.xml"
        p.write_bytes(b"""<root>
          <r n="1"><flag>true</flag><num>3</num><mix>7</mix>
             <inner depth="2"><leaf>9.5</leaf></inner></r>
          <r n="2"><flag>false</flag><num>4.5</num><mix>hello</mix>
             <inner depth="3"><leaf>1</leaf></inner></r>
        </root>""")
        s = infer_xml_schema(p, "r")
        by_name = {f.name: f for f in s.fields}
        assert isinstance(by_name["flag"].dataType, BooleanType)
        assert isinstance(by_name["num"].dataType, DoubleType)  # long∨double
        assert isinstance(by_name["mix"].dataType, StringType)  # long∨string
        assert isinstance(by_name["n"].dataType, LongType)
        inner = by_name["inner"].dataType
        assert isinstance(inner, StructType)
        inner_by = {f.name: f for f in inner.fields}
        assert isinstance(inner_by["depth"].dataType, LongType)
        assert isinstance(inner_by["leaf"].dataType, DoubleType)

    def test_simple_content_value(self, tmp_path):
        p = tmp_path / "s.xml"
        p.write_bytes(b'<root><m unit="kg">12.5</m><m unit="kg">3</m></root>')
        s = infer_xml_schema(p, "m")
        by_name = {f.name: f for f in s.fields}
        assert isinstance(by_name["unit"].dataType, StringType)
        assert isinstance(by_name["_Value"].dataType, DoubleType)

    def test_no_records_raises(self, tmp_path):
        p = tmp_path / "e.xml"
        p.write_bytes(b"<root><other/></root>")
        with pytest.raises(ValueError, match="no <r> records"):
            infer_xml_schema(p, "r")


def test_inferred_read_matches_xsd_read(spark):
    """End to end: read the books fixture twice — XSD-declared and
    schema-free (inferred) — and compare shared scalar columns row by
    row. Types may widen (float→double) but values must agree."""
    from pyspark.sql import functions as F

    from xml_hive_spark.reader import read_xml
    from xml_hive_spark.xsd import xsd_to_struct

    data = str(FIXTURES / "books" / "data.xml")
    declared = read_xml(
        spark, data, "book",
        schema=xsd_to_struct(str(FIXTURES / "books" / "schema.xsd"), "bookType"),
    )
    inferred = read_xml(spark, data, "book")  # no schema, no xsd
    cols = ["author", "title", "genre", "publish_date"]
    a = sorted(tuple(r) for r in declared.select(*cols).collect())
    b = sorted(tuple(r) for r in inferred.select(*cols).collect())
    assert a == b and len(a) > 0
    # numeric column agrees as double
    pa = sorted(r[0] for r in declared.select(F.col("price").cast("double")).collect())
    pb = sorted(r[0] for r in inferred.select(F.col("price").cast("double")).collect())
    assert pa == pb


def test_datasource_bare_inference(spark, tmp_path):
    """format('xmlhive') with only rowTag + path: the DataSource's
    schema() falls back to sampled inference."""
    from xml_hive_spark.sources.xml_datasource import register

    p = tmp_path / "d.xml"
    p.write_bytes(
        b"<root>"
        + b"".join(b'<r k="%d"><v>%d.5</v></r>' % (i, i) for i in range(20))
        + b"</root>"
    )
    register(spark)
    df = (
        spark.read.format("xmlhive")
        .option("rowTag", "r")
        .option("path", str(p))
        .load()
    )
    assert df.schema.simpleString() == "struct<k:bigint,v:double>"
    assert df.count() == 20


# ------------------------------------------------- property tests (lattice)

from hypothesis import given, settings, strategies as st  # noqa: E402

# tokens whose _classify result is known by construction
_TYPED_TOKENS = {
    "bool": ["true", "false", "True", "FALSE"],
    "long": ["0", "42", "-7", "123456789012"],
    "double": ["1.5", "-0.25", "1e3", "0.0"],
    "string": ["hello", "x y", "2020-01-01", "12abc"],
}
_FIELDS = ["f0", "f1", "f2", "f3"]


def _expected_lattice(kinds: set[str]) -> type:
    """The documented unification: all-equal → that type; {long,double} →
    double; any other mix → string; never-seen → string."""
    if not kinds:
        return StringType
    if len(kinds) == 1:
        return {
            "bool": BooleanType,
            "long": LongType,
            "double": DoubleType,
            "string": StringType,
        }[next(iter(kinds))]
    if kinds == {"long", "double"}:
        return DoubleType
    return StringType


@st.composite
def _typed_corpus(draw):
    """Records over a fixed field vocabulary, each occurrence carrying a
    token of a known classification; returns (xml bytes, field→kinds,
    field→max occurrences per record)."""
    n_records = draw(st.integers(2, 8))
    kinds_seen: dict[str, set] = {f: set() for f in _FIELDS}
    max_occ: dict[str, int] = {f: 0 for f in _FIELDS}
    recs = []
    for _ in range(n_records):
        parts = ["<r>"]
        for f in _FIELDS:
            occ = draw(st.integers(0, 2))
            max_occ[f] = max(max_occ[f], occ)
            for _ in range(occ):
                kind = draw(st.sampled_from(sorted(_TYPED_TOKENS)))
                tok = draw(st.sampled_from(_TYPED_TOKENS[kind]))
                kinds_seen[f].add(kind)
                parts.append(f"<{f}>{tok}</{f}>")
        parts.append("</r>")
        recs.append("".join(parts))
    xml = ("<root>" + "".join(recs) + "</root>").encode()
    return xml, kinds_seen, max_occ


@settings(max_examples=100, deadline=None)
@given(corpus=_typed_corpus(), data=st.data())
def test_inference_lattice_property(tmp_path_factory, corpus, data):
    """For ANY seeded-random corpus: each field's inferred type is exactly
    the lattice unification of its observed token classes, repeated
    occurrences become arrays, and the inferred schema parses every
    record it was inferred from without error (soundness)."""
    from xml_hive_spark.reader import parse_record_safe

    xml, kinds_seen, max_occ = corpus
    p = tmp_path_factory.mktemp("prop") / "c.xml"
    p.write_bytes(xml)
    schema = infer_xml_schema(p, "r")
    by_name = {f.name: f for f in schema.fields}
    for f in _FIELDS:
        if max_occ[f] == 0:
            assert f not in by_name  # never observed → never invented
            continue
        dt = by_name[f].dataType
        if max_occ[f] > 1:
            assert isinstance(dt, ArrayType), f
            dt = dt.elementType
        assert isinstance(dt, _expected_lattice(kinds_seen[f])), (
            f, kinds_seen[f], dt
        )
    # soundness: the inferred schema must accept its own sample
    import io

    from xml_hive_spark.reader import iter_record_spans

    for _, rec in iter_record_spans(io.BytesIO(xml), "r", 0, len(xml)):
        row = parse_record_safe(rec, schema, "FAILFAST")
        assert row is not None


def test_inferred_registry_query_matches_xsd_twin(spark):
    """xml_scan_inferred (no schema, no XSD) must reproduce the
    XSD-declared xml_scan_books aggregate on the shared columns."""
    from xml_hive_spark.operators import all_queries

    inferred = {
        (r.genre, r.n_books, r.avg_price)
        for r in all_queries()["xml_scan_inferred"].fn(spark, "unused").collect()
    }
    declared = {
        (r.genre, r.n_books, r.avg_price)
        for r in all_queries()["xml_scan_books"].fn(spark, "unused").collect()
    }
    assert inferred == declared and len(inferred) > 0
