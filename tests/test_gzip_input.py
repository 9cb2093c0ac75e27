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


class TestBoundedCompressedRead:
    def test_raw_limit_hides_appended_member(self, tmp_path):
        """open_xml(raw_limit=N) must decompress exactly the first N
        compressed bytes: a gzip member appended AFTER the offset was
        recorded is invisible — the streaming exactly-once bound."""
        import gzip

        from xml_hive_spark.reader import open_xml

        m1 = gzip.compress(b"<r><i><a>1</a></i><i><a>2</a></i></r>")
        p = tmp_path / "d.xml.gz"
        p.write_bytes(m1)
        recorded = p.stat().st_size
        p.write_bytes(m1 + gzip.compress(b"<r><i><a>99</a></i></r>"))

        with open_xml(str(p)) as f:  # unbounded: sees both members
            assert b"99" in f.read()
        with open_xml(str(p), raw_limit=recorded) as f:
            data = f.read()
        assert b"<a>2</a>" in data and b"99" not in data

    def test_raw_limit_bz2_read_and_seek(self, tmp_path):
        """The bz2 bounded path must actually READ (and survive seeks):
        BZ2File.seek() routes through DecompressReader.seekable() →
        raw.seekable(); _BoundedRaw without a seekable() crashed every
        streaming read of a .xml.bz2 partition (gzip hid the bug because
        _PaddedFile hardcodes seekable()=True)."""
        import bz2

        from xml_hive_spark.reader import open_xml

        m1 = bz2.compress(b"<r><i><a>1</a></i><i><a>2</a></i></r>")
        p = tmp_path / "d.xml.bz2"
        p.write_bytes(m1)
        recorded = p.stat().st_size
        p.write_bytes(m1 + bz2.compress(b"<r><i><a>99</a></i></r>"))

        with open_xml(str(p), raw_limit=recorded) as f:
            assert f.seekable()
            data = f.read()
            f.seek(0)  # the _Buf rewind path the streaming source exercises
            assert f.read() == data
        assert b"<a>2</a>" in data and b"99" not in data

    def test_stream_source_reads_bz2_partition(self, tmp_path):
        """End-to-end: the streaming source's read() path over a .xml.bz2
        file (regression — previously crashed with AttributeError on
        _BoundedRaw.seekable)."""
        import bz2

        from xml_hive_spark.sources.xml_stream import XmlStreamReader

        (tmp_path / "x.xml.bz2").write_bytes(bz2.compress(_corpus(20)))
        rd = XmlStreamReader(SCHEMA, {"path": str(tmp_path), "rowtag": "rec"})
        parts = rd.partitions(rd.initialOffset(), rd.latestOffset())
        assert len(parts) == 1
        rows = list(rd.read(parts[0]))
        total = sum(getattr(b, "num_rows", 1) for b in rows)
        assert total == 20

    def test_stream_partition_carries_raw_limit(self, tmp_path):
        """The streaming source records the admitted size as the
        partition's raw cap and absorbs checkpointed offsets into the
        admission floor (restart: no re-admission of committed files)."""
        import gzip
        import json as _json

        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        from xml_hive_spark.sources.xml_stream import XmlHiveStreamDataSource

        p = tmp_path / "a.xml.gz"
        p.write_bytes(gzip.compress(b"<r><i><a>1</a></i></r>"))
        schema = StructType([StructField("a", LongType(), True,
                             metadata={"xmlKind": "element", "xmlName": "a"})])
        src = XmlHiveStreamDataSource(
            {"rowTag": "i", "path": str(tmp_path), "maxFilesPerTrigger": "1"}
        )
        reader = src.streamReader(schema)
        start = reader.initialOffset()
        end = reader.latestOffset()
        parts = reader.partitions(start, end)
        assert len(parts) == 1 and parts[0].raw_limit == p.stat().st_size

        # simulate restart: fresh reader, committed offset = end
        reader2 = src.streamReader(schema)
        assert reader2.partitions(end, end) == []  # absorbs the floor
        # a second landed file is admitted immediately despite the cap
        q = tmp_path / "b.xml.gz"
        q.write_bytes(gzip.compress(b"<r><i><a>2</a></i></r>"))
        end2 = reader2.latestOffset()
        files = _json.loads(end2["files"])
        assert str(q) in files, "restart floor must not eat the admission cap"
