"""Gzip-compressed XML inputs: .xml.gz files take ONE whole-member
split (non-splittable codec semantics) and must produce exactly the
rows of their uncompressed twin through every read path — plain
read_xml, the xmlhive DataSource (fused columnar scan), pushed
filters, sampled schema inference, and the streaming source."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from xml_hive_spark.reader import (
    GZIP_SPLIT_END,
    plan_splits,
    read_xml,
)

SCHEMA = StructType([
    StructField("id", LongType(), True,
                metadata={"xmlKind": "attribute", "xmlName": "id"}),
    StructField("cat", StringType(), True,
                metadata={"xmlKind": "element", "xmlName": "cat"}),
    StructField("val", IntegerType(), True,
                metadata={"xmlKind": "element", "xmlName": "val"}),
])


def _corpus(n=400):
    recs = "\n".join(
        f'<rec id="{i}"><cat>c{i % 7}</cat><val>{i * 3}</val></rec>'
        for i in range(n)
    )
    return ("<ds>\n" + recs + "\n</ds>").encode()


@pytest.fixture()
def twin(tmp_path):
    data = _corpus()
    plain = tmp_path / "d.xml"
    plain.write_bytes(data)
    gz = tmp_path / "d.xml.gz"
    gz.write_bytes(gzip.compress(data))
    return str(plain), str(gz)


def test_gz_gets_single_whole_member_split(twin):
    _, gz = twin
    splits = plan_splits([gz], partition_bytes=1024)  # tiny budget
    assert splits == [(gz, 0, GZIP_SPLIT_END)]  # never split


def test_read_xml_gz_equals_plain(spark, twin):
    plain, gz = twin
    a = sorted(map(tuple, read_xml(spark, plain, "rec", schema=SCHEMA).collect()))
    b = sorted(map(tuple, read_xml(spark, gz, "rec", schema=SCHEMA).collect()))
    assert a == b and len(a) == 400


def test_pushed_filter_on_gz(spark, twin):
    plain, gz = twin
    cond = (F.col("val") > 600) & F.col("cat").startswith("c3")
    a = sorted(r["id"] for r in
               read_xml(spark, plain, "rec", schema=SCHEMA).filter(cond).collect())
    b = sorted(r["id"] for r in
               read_xml(spark, gz, "rec", schema=SCHEMA).filter(cond).collect())
    assert a == b and len(a) > 0


def test_directory_listing_includes_gz(spark, tmp_path):
    (tmp_path / "a.xml").write_bytes(_corpus(10))
    (tmp_path / "b.xml.gz").write_bytes(gzip.compress(_corpus(5)))
    df = read_xml(spark, str(tmp_path), "rec", schema=SCHEMA)
    assert df.count() == 15


def test_inference_reads_gz(spark, twin):
    _, gz = twin
    df = read_xml(spark, gz, "rec")  # no schema → sampled inference
    assert df.count() == 400
    assert set(df.columns) == {"id", "cat", "val"}


def test_stream_source_gz_partitions(tmp_path):
    from xml_hive_spark.sources.xml_stream import XmlStreamReader

    (tmp_path / "x.xml.gz").write_bytes(gzip.compress(_corpus(20)))
    rd = XmlStreamReader(SCHEMA, {"path": str(tmp_path), "rowtag": "rec"})
    start = rd.initialOffset()
    end = rd.latestOffset()
    assert len(json.loads(end["files"])) == 1
    parts = rd.partitions(start, end)
    assert len(parts) == 1
    assert (parts[0].start, parts[0].end) == (0, GZIP_SPLIT_END)
    rows = list(rd.read(parts[0]))
    total = sum(getattr(b, "num_rows", 1) for b in rows)
    assert total == 20


def test_bz2_reads_like_gz(spark, tmp_path):
    import bz2

    data = _corpus(60)
    (tmp_path / "c.xml.bz2").write_bytes(bz2.compress(data))
    df = read_xml(spark, str(tmp_path / "c.xml.bz2"), "rec", schema=SCHEMA)
    assert df.count() == 60
    splits = plan_splits([str(tmp_path / "c.xml.bz2")], partition_bytes=64)
    assert splits[0][1:] == (0, GZIP_SPLIT_END)
