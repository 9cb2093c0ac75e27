"""Split-safe XML → DataFrame reader.

Capability parity with the reference's record-extraction pipeline
(``AvroTransormer.scala`` + ``AvroFromXmlInputFormat.scala``), re-expressed
for Spark's execution model:

- **Record-boundary detection** (reference: separator-tag watch,
  AvroTransormer.scala:106-109,143-151) is a byte-level scanner that finds
  ``<rowTag ...>...</rowTag>`` spans, depth-aware for nested same-name tags
  and aware of quotes / comments / CDATA.
- **Split safety** (the reference's known gap: it opens every split at byte
  0 → duplicate records on multi-block files,
  AvroFromXmlInputFormat.scala:49; SURVEY.md §4.3): a partition covering
  byte range ``[start, end)`` owns exactly the records whose *start tag*
  begins in that range, reading past ``end`` to close its last record.
  This is what makes the reader correct (and linear) on 100 TB inputs:
  N byte-range partitions each stream their slice once, no overlap.
- **Record assembly** (reference: stack machine over XML pull events,
  AvroTransormer.scala:77-170): each extracted record chunk is parsed with
  ``ElementTree`` and assembled into a tuple directed by the target
  ``StructType`` — attributes as fields, repeated elements as arrays,
  nested complex types as structs, ``_Value`` for simpleContent text
  (AvroTransormer.scala:180-208 coercion semantics).

Known limitations (documented, matching or narrowing reference scope):
namespace-*prefixed* row tags are not matched by the byte scanner (the
reference matches on local label only); records relying on namespace
declarations from ancestor elements outside the record chunk will fail to
parse.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import xml.etree.ElementTree as ET
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path
from typing import BinaryIO, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

DEFAULT_PARTITION_BYTES = 128 * 1024 * 1024

_WS = b" \t\r\n"
_OPEN_DELIMS = b" \t\r\n>/"


class _Buf:
    """Growable forward-only view over a byte stream, addressed by absolute
    file offset. Keeps memory bounded via ``compact``."""

    def __init__(self, f: BinaryIO, start: int, chunk_size: int = 1 << 22):
        f.seek(start)
        self._f = f
        self.base = start
        self.data = bytearray()
        self.eof = False
        self.chunk_size = chunk_size

    def _refill(self) -> bool:
        if self.eof:
            return False
        b = self._f.read(self.chunk_size)
        if not b:
            self.eof = True
            return False
        self.data += b
        return True

    def end_offset(self) -> int:
        return self.base + len(self.data)

    def find(self, pattern: bytes, pos: int) -> int:
        """Absolute offset of next occurrence of ``pattern`` at >= pos,
        -1 at EOF."""
        search_from = max(pos, self.base)
        while True:
            i = self.data.find(pattern, search_from - self.base)
            if i != -1:
                return self.base + i
            # next round only needs to re-scan the possibly-straddling tail
            search_from = max(search_from, self.end_offset() - len(pattern) + 1)
            if not self._refill():
                return -1

    def byte_at(self, off: int) -> int | None:
        while off >= self.end_offset():
            if not self._refill():
                return None
        return self.data[off - self.base]

    def slice(self, a: int, b: int) -> bytes:
        while b > self.end_offset():
            if not self._refill():
                break
        return bytes(self.data[a - self.base : b - self.base])

    def compact(self, keep_from: int) -> None:
        drop = keep_from - self.base
        if drop > self.chunk_size:
            del self.data[:drop]
            self.base = keep_from


def _skip_to(buf: _Buf, end_pat: bytes, pos: int) -> int:
    """Skip past the next ``end_pat``; returns offset after it (EOF-safe)."""
    i = buf.find(end_pat, pos)
    return buf.end_offset() if i == -1 else i + len(end_pat)


def _consume_tag(buf: _Buf, pos: int) -> tuple[int, bool]:
    """``pos`` points just after ``<name``. Scan to the closing ``>`` of
    this start tag, honoring quoted attribute values. Returns
    (offset after '>', self_closing)."""
    quote = 0
    while True:
        c = buf.byte_at(pos)
        if c is None:
            return pos, False  # malformed tail; caller handles EOF
        if quote:
            if c == quote:
                quote = 0
        elif c in (0x22, 0x27):  # " '
            quote = c
        elif c == 0x3E:  # >
            prev = buf.byte_at(pos - 1)
            return pos + 1, prev == 0x2F  # '/'
        pos += 1


def iter_record_spans(
    f: BinaryIO, row_tag: str, start: int, end: int
) -> Iterator[tuple[int, bytes]]:
    """Yield ``(record_start_offset, record_bytes)`` for every row-tag
    record whose start tag begins in ``[start, end)``.

    The scan may read past ``end`` to finish the last record — the standard
    record-boundary protocol for splittable text formats, which the
    reference omits (SURVEY.md §4.3).
    """
    tag = row_tag.encode()
    open_pat = b"<" + tag
    close_pat = b"</" + tag
    comment_pat = b"<!--"
    cdata_pat = b"<![CDATA["

    buf = _Buf(f, start)
    pos = start
    while True:
        if pos >= end:
            return
        # find the next record start, skipping comments / CDATA
        s = buf.find(open_pat, pos)
        if s == -1 or s >= end:
            return
        cm = buf.find(comment_pat, pos)
        if cm != -1 and cm < s:
            pos = _skip_to(buf, b"-->", cm + len(comment_pat))
            continue
        cd = buf.find(cdata_pat, pos)
        if cd != -1 and cd < s:
            pos = _skip_to(buf, b"]]>", cd + len(cdata_pat))
            continue
        nxt = buf.byte_at(s + len(open_pat))
        if nxt is None or nxt not in _OPEN_DELIMS:
            pos = s + 1  # e.g. <bookstore> when row_tag is book
            continue

        # record start confirmed — consume the start tag
        p, self_closing = _consume_tag(buf, s + len(open_pat))
        if self_closing:
            yield s, buf.slice(s, p)
            pos = p
            buf.compact(pos)
            continue
        depth = 1
        while depth > 0:
            no = buf.find(open_pat, p)
            nc = buf.find(close_pat, p)
            cm = buf.find(comment_pat, p)
            cd = buf.find(cdata_pat, p)
            candidates = [(x, k) for x, k in ((no, "o"), (nc, "c"), (cm, "m"), (cd, "d")) if x != -1]
            if not candidates:
                return  # truncated document
            x, kind = min(candidates)
            if kind == "m":
                p = _skip_to(buf, b"-->", x + len(comment_pat))
            elif kind == "d":
                p = _skip_to(buf, b"]]>", x + len(cdata_pat))
            elif kind == "o":
                nxt = buf.byte_at(x + len(open_pat))
                if nxt is not None and nxt in _OPEN_DELIMS:
                    p, sc = _consume_tag(buf, x + len(open_pat))
                    if not sc:
                        depth += 1
                else:
                    p = x + 1
            else:  # close tag — allow optional whitespace before '>'
                q = x + len(close_pat)
                while buf.byte_at(q) in (0x20, 0x09, 0x0D, 0x0A):
                    q += 1
                if buf.byte_at(q) == 0x3E:
                    depth -= 1
                    p = q + 1
                else:
                    p = x + 1
        yield s, buf.slice(s, p)
        pos = p
        buf.compact(pos)


# --------------------------------------------------------------- assembly


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _coerce(text: str | None, dtype: DataType, trim: bool = True):
    """Text → typed value (reference: ``convert``,
    AvroTransormer.scala:194-208 — element text is trimmed of outer
    whitespace, AvroTransormer.scala:98)."""
    if text is None:
        return None
    if trim:
        text = text.strip()
    if text == "" and not isinstance(dtype, StringType):
        return None
    if isinstance(dtype, StringType):
        return text
    if isinstance(dtype, (IntegerType, LongType, ShortType, ByteType)):
        return int(text)
    if isinstance(dtype, (FloatType, DoubleType)):
        return float(text)
    if isinstance(dtype, BooleanType):
        return text.lower() in ("true", "1")
    if isinstance(dtype, DecimalType):
        return Decimal(text)
    if isinstance(dtype, DateType):
        return date.fromisoformat(text)
    if isinstance(dtype, TimestampType):
        return datetime.fromisoformat(text.replace("Z", "+00:00"))
    raise TypeError(f"unsupported scalar type for XML coercion: {dtype}")


def _direct_text(elem: ET.Element) -> str | None:
    """All text directly inside the element (reference accumulates every
    text event at the current stack level — AvroTransormer.scala:159-163)."""
    parts = [elem.text or ""]
    parts += [(c.tail or "") for c in elem]
    s = "".join(parts)
    return s if s.strip() != "" or elem.text is not None else None


def assemble_row(elem: ET.Element, struct: StructType) -> tuple:
    """Element → tuple shaped by ``struct`` (reference: stack-machine record
    assembly, AvroTransormer.scala:80-140; ours is recursive since the
    record chunk is already materialized)."""
    values = []
    children_by_name: dict[str, list[ET.Element]] = {}
    for c in elem:
        children_by_name.setdefault(_local(c.tag), []).append(c)

    for field in struct.fields:
        meta = field.metadata or {}
        kind = meta.get("xmlKind")
        xml_name = meta.get("xmlName", field.name)
        if kind == "text":
            values.append(_coerce(_direct_text(elem), field.dataType))
            continue
        if kind == "attribute" or (
            kind is None and xml_name not in children_by_name and (
                xml_name in elem.attrib or field.name.lstrip("_") in elem.attrib
            )
        ):
            raw = elem.attrib.get(xml_name)
            if raw is None:
                raw = elem.attrib.get(field.name.lstrip("_"))
            # attributes are not trimmed (reference: setAttributes copies
            # the raw attribute value, AvroTransormer.scala:180-188)
            values.append(_coerce(raw, field.dataType, trim=False))
            continue
        if field.name == "_Value" and kind is None:
            values.append(_coerce(_direct_text(elem), field.dataType))
            continue
        occurrences = children_by_name.get(xml_name, [])
        dtype = field.dataType
        if isinstance(dtype, ArrayType):
            if not occurrences:
                values.append(None if field.nullable else [])
            elif isinstance(dtype.elementType, StructType):
                values.append(
                    [assemble_row(c, dtype.elementType) for c in occurrences]
                )
            else:
                values.append(
                    [_coerce(_direct_text(c), dtype.elementType) for c in occurrences]
                )
        elif isinstance(dtype, StructType):
            values.append(assemble_row(occurrences[0], dtype) if occurrences else None)
        else:
            values.append(
                _coerce(_direct_text(occurrences[0]), dtype) if occurrences else None
            )
    return tuple(values)


def parse_record(record_bytes: bytes, struct: StructType) -> tuple:
    elem = ET.fromstring(record_bytes)
    return assemble_row(elem, struct)


def parse_record_safe(record_bytes: bytes, struct: StructType, mode: str):
    """Malformed-record policy (reference drops bad records with a console
    warning — "oopsie", AvroTransormer.scala:185):

    - ``FAILFAST``: raise (default — correctness-first).
    - ``DROPMALFORMED``: skip the record (reference parity).
    - ``PERMISSIVE``: emit an all-null row so downstream can count/route
      corrupt records.
    Returns the row tuple, None to drop, or raises."""
    try:
        return parse_record(record_bytes, struct)
    except Exception:
        if mode == "DROPMALFORMED":
            return None
        if mode == "PERMISSIVE":
            return tuple(None for _ in struct.fields)
        raise


# ---------------------------------------------------------------- planning


def plan_splits(
    paths: list[str], partition_bytes: int = DEFAULT_PARTITION_BYTES
) -> list[tuple[str, int, int]]:
    """(file, start, end) byte-range splits — one Spark task each.

    At 100 TB this is what keeps parallelism = data size / partition_bytes
    rather than = file count (the reference is one task per HDFS split but
    re-reads whole files, SURVEY.md §4.3)."""
    splits: list[tuple[str, int, int]] = []
    for p in paths:
        size = os.path.getsize(p)
        if size == 0:
            continue
        n = max(1, (size + partition_bytes - 1) // partition_bytes)
        step = (size + n - 1) // n
        for i in range(n):
            a, b = i * step, min((i + 1) * step, size)
            if a < b:
                splits.append((p, a, b))
    return splits


def resolve_paths(path: str | list[str]) -> list[str]:
    patterns = [path] if isinstance(path, str) else list(path)
    out: list[str] = []
    for pat in patterns:
        p = Path(pat)
        if p.is_dir():
            out += [str(c) for c in sorted(p.iterdir()) if c.suffix == ".xml"]
        elif p.is_file():
            out.append(str(p))
        else:
            out += sorted(_glob.glob(pat))
    if not out:
        raise FileNotFoundError(f"no XML input files for {path!r}")
    return out


def _read_split(
    split: tuple[str, int, int],
    row_tag: str,
    struct: StructType,
    mode: str = "FAILFAST",
):
    path, a, b = split
    with open(path, "rb") as f:
        for _, rec in iter_record_spans(f, row_tag, a, b):
            row = parse_record_safe(rec, struct, mode)
            if row is not None:
                yield row


# -------------------------------------------------------------- public API


def read_xml(
    spark: SparkSession,
    path: str | list[str],
    row_tag: str,
    schema: StructType | None = None,
    xsd: str | Path | None = None,
    sep_tag_type: str | None = None,
    ns: str | None = None,
    rich_types: bool = False,
    partition_bytes: int = DEFAULT_PARTITION_BYTES,
    use_datasource: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Read XML files into a DataFrame, one row per ``row_tag`` record.

    Schema comes from an explicit ``schema``, or from an XSD file/dir +
    ``sep_tag_type`` (the reference's ``xml.schema.location`` +
    ``xml.separator.tag.type`` table properties,
    AvroTransormer.scala:54-57), mirroring
    ``spark.read.format("xmlhive")`` options.
    """
    if schema is None:
        if xsd is None or sep_tag_type is None:
            raise ValueError("provide schema=, or xsd= and sep_tag_type=")
        from xml_hive_spark.xsd import xsd_to_struct

        schema = xsd_to_struct(xsd, sep_tag_type, ns, rich_types=rich_types)

    if use_datasource:
        try:
            from xml_hive_spark.sources.xml_datasource import register

            register(spark)
            reader = (
                spark.read.format("xmlhive")
                .schema(schema)
                .option("rowTag", row_tag)
                .option("partitionBytes", str(partition_bytes))
                .option("mode", mode)
            )
            paths = resolve_paths(path)
            return reader.option("paths", "\n".join(paths)).load()
        except Exception:
            pass  # fall back to the RDD path below

    return read_xml_rdd(spark, path, row_tag, schema, partition_bytes, mode)


def read_xml_rdd(
    spark: SparkSession,
    path: str | list[str],
    row_tag: str,
    schema: StructType,
    partition_bytes: int = DEFAULT_PARTITION_BYTES,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Fallback reader: parallelized byte-range splits + per-partition
    record scan. Same split protocol as the DataSource path."""
    from xml_hive_spark.sources.xml_datasource import ship_package

    ship_package(spark)  # executors unpickle _read_split by module reference
    splits = plan_splits(resolve_paths(path), partition_bytes)
    sc = spark.sparkContext
    rdd = sc.parallelize(splits, len(splits)).flatMap(
        lambda s: _read_split(s, row_tag, schema, mode)
    )
    return spark.createDataFrame(rdd, schema)
