"""Streaming XML source: landing-directory file watcher.

``readStream.format("xmlhive-stream")`` tails a directory for new XML
files and emits their records exactly once — the streaming twin of the
batch reader, built on Spark 4's ``SimpleDataSourceStreamReader``
(offsets = the set of files already emitted, so replays are idempotent).

The reference has no streaming surface at all (batch ``InputFormat``
only, AvroFromXmlInputFormat.scala:15); this is extension scope
(SURVEY.md §7 M6).

Usage::

    spark.dataSource.register(XmlHiveStreamDataSource)
    stream = (spark.readStream.format("xmlhive-stream")
              .schema(struct)
              .option("rowTag", "book")
              .option("path", "/landing/dir")
              .load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from xml_hive_spark.reader import _read_split
from xml_hive_spark.sources.xml_datasource import _opt
from xml_hive_spark.xsd import xsd_to_struct


def _strip_metadata(struct: StructType) -> StructType:
    """Drop field metadata recursively. The streaming Arrow transfer
    (PythonStreamingSourceRunner.readArrowRecordBatches) asserts schema
    equality in a way that rejects StructField metadata, so the schema
    Spark sees must be metadata-free; the reader keeps a metadata-rich
    twin for XML record assembly."""
    from pyspark.sql.types import ArrayType, StructField

    def strip_type(dt):
        if isinstance(dt, StructType):
            return _strip_metadata(dt)
        if isinstance(dt, ArrayType):
            return ArrayType(strip_type(dt.elementType), dt.containsNull)
        return dt

    return StructType(
        [StructField(f.name, strip_type(f.dataType), f.nullable) for f in struct.fields]
    )


class XmlHiveStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xmlhive-stream"

    def _rich_schema(self) -> StructType | None:
        xsd = _opt(self.options, "xsd")
        sep_type = _opt(self.options, "sepTagType", "septagtype")
        if not xsd or not sep_type:
            return None
        return xsd_to_struct(xsd, sep_type, _opt(self.options, "sepTagTypeNs"))

    def schema(self) -> StructType:
        rich = self._rich_schema()
        if rich is None:
            raise ValueError(
                "xmlhive-stream: pass .schema(...) or options xsd= and sepTagType="
            )
        return _strip_metadata(rich)

    def simpleStreamReader(self, schema: StructType) -> "XmlStreamReader":
        # prefer the XSD-derived schema (carries attribute/element kind
        # metadata) for assembly; fall back to the user schema + the
        # assembler's attribute-name heuristics
        return XmlStreamReader(self._rich_schema() or schema, self.options)


class XmlStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"files": {path: size_at_emit}}. Each micro-batch emits
    every complete new file exactly once; a file is re-emitted only if it
    was never recorded (size changes after emit are ignored — landing
    dirs are append-new-files, the standard contract for file streams)."""

    def __init__(self, schema: StructType, options):
        self._schema = schema
        self._dir = _opt(options, "path", "paths")
        if not self._dir:
            raise ValueError("xmlhive-stream: path option is required")
        self._row_tag = _opt(options, "rowTag", "rowtag")
        if not self._row_tag:
            raise ValueError("xmlhive-stream: rowTag option is required")

    # NOTE: offsets must be FLAT dicts — a nested dict value crashes
    # PythonStreamingSourceRunner.readArrowRecordBatches with a bare
    # AssertionError (empirically bisected on Spark 4.1). The file→size
    # map is therefore JSON-encoded into a single string field.

    def initialOffset(self) -> dict:
        return {"files": json.dumps({})}

    def _list(self) -> dict[str, int]:
        try:
            entries = os.listdir(self._dir)
        except FileNotFoundError:
            return {}
        out: dict[str, int] = {}
        for e in sorted(entries):
            if e.endswith(".xml"):
                p = os.path.join(self._dir, e)
                try:
                    out[p] = os.path.getsize(p)
                except OSError:
                    continue
        return out

    def read(self, start: dict):
        seen = json.loads(start.get("files", "{}"))
        current = self._list()
        new_files = [p for p in current if p not in seen]
        if not new_files:
            return iter([]), start  # unchanged offset → no batch planned
        rows = []
        for p in new_files:
            rows.extend(
                _read_split((p, 0, current[p]), self._row_tag, self._schema)
            )
            seen[p] = current[p]
        return iter(rows), {"files": json.dumps(seen, sort_keys=True)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: emit files in end but not start
        seen = json.loads(start.get("files", "{}"))
        target = json.loads(end.get("files", "{}"))
        rows = []
        for p, size in target.items():
            if p not in seen and os.path.exists(p):
                rows.extend(_read_split((p, 0, size), self._row_tag, self._schema))
        return iter(rows)


def register_stream(spark) -> None:
    """Register the streaming source. Unlike batch data-source workers,
    the streaming source runner process does NOT receive addPyFile paths
    (observed: ModuleNotFoundError in python_streaming_source_runner), so
    the whole module chain the stream touches is pickled BY VALUE via
    cloudpickle — the runner needs no importable xml_hive_spark."""
    import xml_hive_spark.reader as _reader_mod
    import xml_hive_spark.sources.xml_datasource as _ds_mod
    import xml_hive_spark.sources.xml_stream as _stream_mod
    import xml_hive_spark.xsd as _xsd_mod
    from pyspark import cloudpickle

    for m in (_stream_mod, _ds_mod, _reader_mod, _xsd_mod):
        cloudpickle.register_pickle_by_value(m)
    spark.dataSource.register(XmlHiveStreamDataSource)
