"""Sampled XML schema inference — reading XML without an XSD.

The reference REQUIRES an XSD (``xml.schema.location`` is mandatory,
AvroTransormer.scala:35,57): a user with raw XML and no schema cannot
use it at all. Inference closes that gap the way Spark's own sources
do (JSON/CSV ``inferSchema``): parse a bounded sample of records,
unify per-field observations into a ``StructType``, then run the
normal typed read. The sample is bounded (default 200 records from the
head of the first file) so inference cost is O(sample), never a full
corpus pass — at 100 TB that's the only acceptable shape, and users
who need exactness still pass an XSD or explicit schema.

Shape rules (mirroring the XSD converter's output conventions so the
reader treats inferred and converted schemas identically):

- attribute      → scalar field named after the attribute (``_``-prefixed
                   only on collision with an element name — xsd.py:379),
                   metadata ``xmlKind=attribute``
- child element, scalar, seen ≤1× per record → nullable scalar field
- child element seen >1× in ANY sampled record → ``ArrayType``
- child element with attributes/children → nested ``StructType``;
  trailing text alongside attributes lands in ``_Value``
  (simpleContent convention, XMLToAvroSchema.scala:256)
- text types unify over the lattice bool < long < double < string;
  mixing bool with numerics falls to string (never silently coerced)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from xml_hive_spark.reader import (
    _bind_unbound_prefixes,
    _local,
    iter_record_spans,
    resolve_paths,
)

DEFAULT_SAMPLE_RECORDS = 200


def _classify(text: str) -> str | None:
    t = text.strip()
    if t == "":
        return None
    if t.lower() in ("true", "false"):
        return "bool"
    try:
        int(t)
        return "long"
    except ValueError:
        pass
    try:
        float(t)
        return "double"
    except ValueError:
        return "string"


def _unify(a: str | None, b: str | None) -> str | None:
    if a is None:
        return b
    if b is None:
        return a
    if a == b:
        return a
    if {a, b} <= {"long", "double"}:
        return "double"
    return "string"  # bool+numeric, anything+string: be explicit, not clever


_SPARK_TYPE = {
    "bool": BooleanType(),
    "long": LongType(),
    "double": DoubleType(),
    "string": StringType(),
    None: StringType(),  # field seen but never with usable text
}


class _NodeSpec:
    """Accumulated observations for one element position in the tree."""

    __slots__ = ("attrs", "children", "child_order", "max_count", "text_type",
                 "has_structure")

    def __init__(self) -> None:
        self.attrs: dict[str, str | None] = {}
        self.children: dict[str, _NodeSpec] = {}
        self.child_order: list[str] = []
        self.max_count: dict[str, int] = {}
        self.text_type: str | None = None
        self.has_structure = False  # any attrs or child elements observed

    def observe(self, elem: ET.Element) -> None:
        for k, v in elem.attrib.items():
            name = _local(k)
            self.attrs[name] = _unify(self.attrs.get(name), _classify(v))
            self.has_structure = True
        counts: dict[str, int] = {}
        for c in elem:
            name = _local(c.tag)
            counts[name] = counts.get(name, 0) + 1
            if name not in self.children:
                self.children[name] = _NodeSpec()
                self.child_order.append(name)
            self.children[name].observe(c)
            self.has_structure = True
        for name, n in counts.items():
            self.max_count[name] = max(self.max_count.get(name, 0), n)
        # direct text (the reference captures trailing text,
        # AvroTransormer.scala:159-163; we look at all direct text)
        parts = [elem.text or ""] + [(c.tail or "") for c in elem]
        direct = "".join(parts)
        if direct.strip():
            self.text_type = _unify(self.text_type, _classify(direct))

    # ---------------------------------------------------------- emission

    def scalar_type(self) -> DataType:
        return _SPARK_TYPE[self.text_type]

    def to_struct(self) -> StructType:
        fields: list[StructField] = []
        element_names = set(self.child_order)
        # attributes first — the converter's field order (xsd.py /
        # XMLToAvroSchema.scala:92-116 put attributes before elements)
        for name in sorted(self.attrs):
            fname = name if name not in element_names else f"_{name}"
            fields.append(
                StructField(
                    fname,
                    _SPARK_TYPE[self.attrs[name]],
                    True,
                    metadata={"xmlKind": "attribute", "xmlName": name},
                )
            )
        if self.attrs and self.text_type is not None:
            # simpleContent: text next to attributes → synthetic _Value
            fields.append(
                StructField("_Value", self.scalar_type(), True, metadata={})
            )
        for name in self.child_order:
            spec = self.children[name]
            if spec.has_structure:
                inner: DataType = spec.to_struct()
            else:
                inner = spec.scalar_type()
            if self.max_count.get(name, 1) > 1:
                inner = ArrayType(inner, True)
            meta = (
                {"xmlKind": "element", "xmlName": name}
                if not isinstance(inner, (StructType, ArrayType))
                else {"xmlName": name}
            )
            fields.append(StructField(name, inner, True, metadata=meta))
        return StructType(fields)


def infer_xml_schema(
    path: str | list[str] | Path,
    row_tag: str,
    sample_records: int = DEFAULT_SAMPLE_RECORDS,
) -> StructType:
    """Infer a ``StructType`` for ``row_tag`` records from a bounded
    sample at the head of the input (first file(s), first
    ``sample_records`` records)."""
    paths = resolve_paths(str(path) if isinstance(path, Path) else path)
    root = _NodeSpec()
    seen = 0
    import os

    for p in paths:
        from xml_hive_spark.reader import GZIP_SPLIT_END, open_xml

        end = (GZIP_SPLIT_END if p.endswith((".gz", ".bz2"))
               else os.path.getsize(p))
        with open_xml(p) as f:
            for _, rec in iter_record_spans(f, row_tag, 0, end):
                root.observe(ET.fromstring(_bind_unbound_prefixes(rec)))
                seen += 1
                if seen >= sample_records:
                    break
        if seen >= sample_records:
            break
    if seen == 0:
        raise ValueError(
            f"xmlhive: no <{row_tag}> records found while inferring a schema"
        )
    return root.to_struct()
