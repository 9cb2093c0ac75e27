"""XSD → Spark ``StructType`` converter.

Capability parity with the reference's XSD→Avro schema generator
(``/root/reference/src/main/scala/com/github/xmlavrobridge/XMLToAvroSchema.scala``),
re-expressed as a one-phase pure-Python converter (no Avro-JSON round trip —
``StructType`` is produced directly; see SURVEY.md §1.3).

Semantics mirrored from the reference (cites into the reference tree):

- ``(namespace, name)``-keyed type maps for complex types, simple types and
  global elements (XMLToAvroSchema.scala:32-34).
- ``sequence`` / nested ``sequence`` / ``all`` walked for child elements;
  ``choice`` (which the reference REJECTS — XMLToAvroSchema.scala:247-249)
  relaxes beyond-reference to every-branch-optional (members nullable);
  ``xs:union`` widens to string.
- Anonymous inline complex/simple types are synthesized as ``<name>Type``
  (XMLToAvroSchema.scala:287-297).
- Cardinality: ``maxOccurs > 1`` → array (XMLToAvroSchema.scala:140-158),
  ``minOccurs = 0`` → nullable (XMLToAvroSchema.scala:122-136); elements
  missing the attributes inherit cardinality from the enclosing ``sequence``
  (XMLToAvroSchema.scala:300-310).
- XML attributes become struct fields; optional attributes
  (``use != "required"``) are nullable (XMLToAvroSchema.scala:101-116).
  If an attribute name collides with an element name in the same struct we
  prefix it with ``_`` (the reference lets them collide last-write-wins —
  AvroTransormer.scala:190 — ours keeps both, SURVEY.md §7 hard-part 3).
- ``simpleContent`` + ``extension`` → struct with a synthetic ``_Value``
  field for the text (XMLToAvroSchema.scala:256,268-273).
- ``simpleType`` with enumeration restriction → string; allowed values are
  carried in field metadata but NOT enforced, matching the reference which
  never validates enum values (AvroTransormer.scala:202).
- Primitive map + suffix-matching fallback (XMLToAvroSchema.scala:36-47,
  332-346); mapping table in SURVEY.md §1.2 (decimal→double, temporals→
  string for parity; richer types opt-in via ``temporal_as_string=False``
  etc.).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field as dc_field
from pathlib import Path
from typing import Callable

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

XS_NS = "http://www.w3.org/2001/XMLSchema"

# exact-match primitive table (reference: primitivesMap,
# XMLToAvroSchema.scala:36-47) → Spark types per SURVEY.md §1.2
_PRIMITIVES: dict[str, DataType] = {
    "string": StringType(),
    "int": IntegerType(),
    "integer": IntegerType(),
    "long": LongType(),
    "boolean": BooleanType(),
    "decimal": DoubleType(),  # lossy, parity with reference
    "float": FloatType(),
    "double": DoubleType(),
    "dateTime": StringType(),  # reference keeps temporals as strings
    "date": StringType(),
    "time": StringType(),
}

# richer opt-in temporal/decimal mapping (SURVEY.md §1.2 "option" column)
_RICH_OVERRIDES: dict[str, DataType] = {
    "decimal": DecimalType(38, 18),
    "dateTime": TimestampType(),
    "date": DateType(),
}

# suffix-matching fallback, longest suffix first (reference: xsdToAvro,
# XMLToAvroSchema.scala:332-346 matches by suffix so e.g.
# nonNegativeInteger → integer → int)
_SUFFIX_ORDER = [
    "dateTime",
    "date",
    "time",
    "string",
    "integer",
    "int",
    "long",
    "boolean",
    "decimal",
    "float",
    "double",
]


@dataclass
class XsdAttribute:
    name: str
    type_ref: tuple[str, str]  # (ns, local type name)
    required: bool


@dataclass
class XsdElement:
    name: str
    type_ref: tuple[str, str]
    min_occurs: int
    max_occurs: int  # -1 == unbounded
    # (ns, name) of a global element this is a ref= to; name/type resolve
    # lazily at struct_for time (the target may be declared later or in
    # another file), while occurs stay those of the ref SITE (XSD rules)
    ref: tuple[str, str] | None = None
    # (ns, name) of a model group whose definition wasn't registered yet
    # at parse time (defined in a file parsed later): expands lazily at
    # struct_for time, preserving its position in the sequence
    group_ref: tuple[str, str] | None = None


@dataclass
class XsdComplexType:
    name: str
    ns: str
    elements: list[XsdElement] = dc_field(default_factory=list)
    attributes: list[XsdAttribute] = dc_field(default_factory=list)
    # attributeGroup refs unresolved at parse time → retried lazily
    deferred_attr_groups: list[tuple[str, str]] = dc_field(
        default_factory=list
    )
    # (ns, name) of the simpleContent extension base, if any → _Value field
    simple_content_base: tuple[str, str] | None = None
    # (ns, name) of a complexContent extension base (type inheritance):
    # the base type's fields precede this type's own — resolved lazily at
    # struct_for time so definition order across files doesn't matter
    complex_content_base: tuple[str, str] | None = None


@dataclass
class XsdSimpleType:
    name: str
    ns: str
    base_ref: tuple[str, str]
    enum_values: list[str] = dc_field(default_factory=list)


class XsdGraph:
    """Parsed type graph: the reference's three ``(ns,name)`` maps
    (XMLToAvroSchema.scala:32-34) in one object."""

    def __init__(self) -> None:
        self.complex_types: dict[tuple[str, str], XsdComplexType] = {}
        self.simple_types: dict[tuple[str, str], XsdSimpleType] = {}
        self.root_elements: dict[tuple[str, str], XsdElement] = {}
        # named model/attribute groups: (ns, name) → (node, scopes of the
        # defining tree). BEYOND-reference (it has no group support at
        # all): refs are spliced inline at the use site. Nodes are kept
        # with their OWN prefix scopes so a group defined in one file
        # resolves its type prefixes correctly when referenced from
        # another (definition must parse before use across files;
        # same-file order is free via the pre-pass)
        self.model_groups: dict[tuple[str, str], tuple] = {}
        self.attr_groups: dict[tuple[str, str], tuple] = {}
        self._group_stack: set[tuple[str, str, str]] = set()
        # substitution groups: head (ns, name) → member elements; heads
        # declared abstract never appear in instances themselves
        self.substitution_members: dict[tuple[str, str], list] = {}
        self.abstract_elements: set[tuple[str, str]] = set()

    # ---------------------------------------------------------------- parse

    @classmethod
    def parse_dir(
        cls,
        path: str | Path,
        list_files: Callable[[str], list[str]] | None = None,
        read_file: Callable[[str], str] | None = None,
    ) -> "XsdGraph":
        """Parse every XSD file in a directory (reference skips ``.avsc``
        files — HFSReader.scala:10-18 / XMLToAvroSchema.scala:206-218).

        ``list_files``/``read_file`` injection mirrors the reference's
        IO-abstraction (XMLToAvroSchema.scala:49-50) so tests / remote
        filesystems can plug in.
        """
        graph = cls()
        if list_files is None:
            files = [str(p) for p in sorted(Path(path).iterdir()) if p.is_file()]
        else:
            files = list_files(str(path))
        xsd_files = [f for f in files if f.endswith(".xsd")]
        # reference parses every non-.avsc file in the dir; we additionally
        # require the .xsd extension when any .xsd file is present, so a
        # schema dir with stray data/readme files doesn't crash the parse
        for f in xsd_files or [f for f in files if not f.endswith(".avsc")]:
            text = read_file(f) if read_file else Path(f).read_text()
            graph.parse_source(text)
        return graph

    @classmethod
    def parse_file(cls, path: str | Path) -> "XsdGraph":
        """Parse one XSD file plus its ``xs:include`` / ``xs:import``
        closure (schemaLocation resolved relative to the including
        file, cycle-guarded) — a single-file entry point no longer
        silently misses types factored into sibling schemas. BEYOND
        the reference, which only ever walks a whole directory
        (HFSReader.scala:10-18) and ignores include/import."""
        graph = cls()
        seen: set[str] = set()

        def load(p: Path) -> None:
            rp = str(p.resolve())
            if rp in seen or not p.is_file():
                return
            seen.add(rp)
            text = p.read_text()
            # POST-ORDER: includes parse before the including file, so
            # their named groups/attributeGroups are registered by the
            # time this file's complexTypes splice refs eagerly (element
            # refs and complexContent bases resolve lazily and would
            # tolerate any order; group splicing would not). The
            # discovery parse below is include-scan only — a discovery
            # failure just means no includes; parse_source raises the
            # real error on the same text either way
            try:
                root = ET.fromstring(text)
            except ET.ParseError:
                root = None
            if root is not None:
                for child in root:
                    if _local(child.tag) in ("include", "import"):
                        loc = child.get("schemaLocation")
                        if loc and "://" not in loc:
                            load(p.parent / loc)
            graph.parse_source(text)

        load(Path(path))
        return graph

    def parse_source(self, xsd_text: str) -> None:
        root, scopes = _parse_with_scopes(xsd_text)
        if _local(root.tag) != "schema":
            raise ValueError("not an XSD document (root must be xs:schema)")
        tns = root.get("targetNamespace", "")
        # scopes are keyed by element identity; keep the tree alive while
        # the walk runs so ids stay unique
        self._scopes, self._scope_root = scopes, root
        try:
            # pre-pass: register named groups so same-file definition
            # order doesn't matter (the tree and its scopes are retained
            # by the registry entries for later cross-file use)
            for child in root:
                tag = _local(child.tag)
                gname = child.get("name")
                if tag == "group" and gname:
                    self.model_groups[(tns, gname)] = (child, scopes)
                elif tag == "attributeGroup" and gname:
                    self.attr_groups[(tns, gname)] = (child, scopes)
            for child in root:
                tag = _local(child.tag)
                if tag == "complexType":
                    self._parse_complex_type(child, child.get("name"), tns)
                elif tag == "simpleType":
                    self._parse_simple_type(child, child.get("name"), tns)
                elif tag == "element":
                    elm = self._parse_element(child, None, tns)
                    self.root_elements[(tns, elm.name)] = elm
                    if child.get("abstract") == "true":
                        self.abstract_elements.add((tns, elm.name))
                    sub = child.get("substitutionGroup")
                    if sub:
                        head = _split_type(sub, self._ns(child), tns)
                        self.substitution_members.setdefault(
                            head, []
                        ).append(elm)
        finally:
            self._scopes, self._scope_root = None, None

    def _ns(self, node: ET.Element) -> dict[str, str]:
        """The prefix→URI map in effect at ``node`` (per-node scope)."""
        return self._scopes.get(id(node), {}) if self._scopes else {}

    def _parse_complex_type(
        self, node: ET.Element, name: str | None, tns: str
    ) -> tuple[str, str]:
        if name is None:
            raise ValueError("anonymous complexType must be named by caller")
        ct = XsdComplexType(name=name, ns=tns)
        self.complex_types[(tns, name)] = ct
        for child in node:
            tag = _local(child.tag)
            if tag in ("sequence", "all"):
                self._parse_sequence(child, ct, tns)
            elif tag == "attribute":
                ct.attributes.append(self._parse_attribute(child, tns))
            elif tag == "simpleContent":
                # extension base → _Value + extension attributes
                # (reference: XMLToAvroSchema.scala:256,268-273)
                for ext in child:
                    if _local(ext.tag) == "extension":
                        base = ext.get("base")
                        if base:
                            ct.simple_content_base = _split_type(base, self._ns(ext), tns)
                        for a in ext:
                            if _local(a.tag) == "attribute":
                                ct.attributes.append(
                                    self._parse_attribute(a, tns)
                                )
            elif tag == "choice":
                # BEYOND-reference (it raises on choice —
                # XMLToAvroSchema.scala:247-249): relax to "every branch
                # optional" — each member element parses normally and is
                # then forced nullable (min_occurs=0), the standard
                # relational flattening of an exclusive alternative
                self._parse_choice(child, ct, tns)
            elif tag == "group":
                self._splice_model_group(child, ct, tns)
            elif tag == "attributeGroup":
                self._splice_attr_group(child, ct, tns)
            elif tag == "complexContent":
                # BEYOND-reference: type inheritance. extension = base
                # fields (resolved lazily; see struct_for) + own content;
                # restriction redeclares what it keeps, so only its own
                # content parses (no base splice)
                for inner in child:
                    itag = _local(inner.tag)
                    if itag in ("extension", "restriction"):
                        base = inner.get("base")
                        if itag == "extension" and base:
                            ct.complex_content_base = _split_type(
                                base, self._ns(inner), tns
                            )
                        for sub in inner:
                            stag = _local(sub.tag)
                            if stag in ("sequence", "all"):
                                self._parse_sequence(sub, ct, tns)
                            elif stag == "choice":
                                self._parse_choice(sub, ct, tns)
                            elif stag == "attribute":
                                ct.attributes.append(
                                    self._parse_attribute(sub, tns)
                                )
                            elif stag == "group":
                                self._splice_model_group(sub, ct, tns)
                            elif stag == "attributeGroup":
                                self._splice_attr_group(sub, ct, tns)
        return (tns, name)

    def _resolve_group_ref(self, node: ET.Element, registry, tns: str):
        """(key, node, scopes) for a group/attributeGroup ref, or None
        (missing definition / no ref attr: splice nothing — the silent
        pre-support behavior, never an error)."""
        ref = node.get("ref")
        if not ref:
            return None
        key = _split_type(ref, self._ns(node), tns)
        entry = registry.get(key) or registry.get((tns, key[1]))
        if entry is None:
            return None
        return key, entry[0], entry[1]

    def _splice_model_group(
        self, node: ET.Element, ct: XsdComplexType, tns: str
    ) -> None:
        hit = self._resolve_group_ref(node, self.model_groups, tns)
        if hit is None:
            # not registered yet (defined in a file parsed later): leave
            # a position-preserving placeholder; _deref_element retries
            # against the full registry at struct_for time
            ref = node.get("ref")
            if ref:
                ct.elements.append(XsdElement(
                    name="", type_ref=(XS_NS, "string"), min_occurs=1,
                    max_occurs=1,
                    group_ref=_split_type(ref, self._ns(node), tns),
                ))
            return
        key, gnode, gscopes = hit
        guard = ("g", *key)
        if guard in self._group_stack:  # cyclic ref: splice once
            return
        self._group_stack.add(guard)
        prev = self._scopes
        self._scopes = gscopes
        try:
            for child in gnode:  # model group content: sequence/all/choice
                tag = _local(child.tag)
                if tag in ("sequence", "all"):
                    self._parse_sequence(child, ct, key[0] or tns)
                elif tag == "choice":
                    self._parse_choice(child, ct, key[0] or tns)
        finally:
            self._scopes = prev
            self._group_stack.discard(guard)

    def _splice_attr_group(
        self, node: ET.Element, ct: XsdComplexType, tns: str
    ) -> None:
        hit = self._resolve_group_ref(node, self.attr_groups, tns)
        if hit is None:
            ref = node.get("ref")
            if ref:  # retried lazily at struct_for time
                ct.deferred_attr_groups.append(
                    _split_type(ref, self._ns(node), tns)
                )
            return
        key, gnode, gscopes = hit
        guard = ("a", *key)
        if guard in self._group_stack:
            return
        self._group_stack.add(guard)
        prev = self._scopes
        self._scopes = gscopes
        try:
            for child in gnode:
                tag = _local(child.tag)
                if tag == "attribute":
                    ct.attributes.append(
                        self._parse_attribute(child, key[0] or tns)
                    )
                elif tag == "attributeGroup":  # nested group refs
                    self._splice_attr_group(child, ct, key[0] or tns)
        finally:
            self._scopes = prev
            self._group_stack.discard(guard)

    def _parse_choice(
        self, node: ET.Element, ct: XsdComplexType, tns: str
    ) -> None:
        before = len(ct.elements)
        self._parse_sequence(node, ct, tns)
        for el in ct.elements[before:]:
            el.min_occurs = 0

    def _parse_sequence(
        self, seq: ET.Element, ct: XsdComplexType, tns: str
    ) -> None:
        for child in seq:
            tag = _local(child.tag)
            if tag == "element":
                ct.elements.append(self._parse_element(child, seq, tns))
            elif tag in ("sequence", "all"):
                # nested sequence flattened into the same record
                # (reference: XMLToAvroSchema.scala:247-249)
                self._parse_sequence(child, ct, tns)
            elif tag == "choice":
                self._parse_choice(child, ct, tns)
            elif tag == "group":
                self._splice_model_group(child, ct, tns)

    def _parse_attribute(
        self, node: ET.Element, tns: str
    ) -> XsdAttribute:
        name = node.get("name") or ""
        type_s = node.get("type", "string")
        return XsdAttribute(
            name=name,
            type_ref=_split_type(type_s, self._ns(node), tns),
            # use != "required" → nullable (XMLToAvroSchema.scala:101-114)
            required=node.get("use") == "required",
        )

    def _parse_simple_type(
        self, node: ET.Element, name: str | None, tns: str
    ) -> tuple[str, str]:
        if name is None:
            raise ValueError("anonymous simpleType must be named by caller")
        base_ref = (XS_NS, "string")
        enum_values: list[str] = []
        for child in node:
            if _local(child.tag) in ("union", "list"):
                # BEYOND-reference: xs:union widens to string — the one
                # primitive every member type's lexical form fits —
                # and xs:list keeps its space-separated LEXICAL form as
                # string (split with F.split(col, ' ') downstream when
                # array semantics are wanted; the reference raises on
                # both constructs). Unknown children already
                # string-default; these two are explicit.
                base_ref = (XS_NS, "string")
            elif _local(child.tag) == "restriction":
                base = child.get("base")
                if base:
                    base_ref = _split_type(base, self._ns(child), tns)
                for facet in child:
                    if _local(facet.tag) == "enumeration":
                        v = facet.get("value")
                        if v is not None:
                            enum_values.append(v)
                    # min/maxInclusive etc. facets ignored, parity with
                    # reference (SURVEY.md §5 fixture 3)
        st = XsdSimpleType(name=name, ns=tns, base_ref=base_ref, enum_values=enum_values)
        self.simple_types[(tns, name)] = st
        return (tns, name)

    def _parse_element(
        self,
        node: ET.Element,
        enclosing_seq: ET.Element | None,
        tns: str,
    ) -> XsdElement:
        name = node.get("name") or ""
        # cardinality with fallback to the enclosing sequence
        # (reference: XMLToAvroSchema.scala:300-310)
        def occurs(attr: str, default: str) -> str:
            v = node.get(attr)
            if v is None and enclosing_seq is not None:
                v = enclosing_seq.get(attr)
            return v if v is not None else default

        min_occurs = occurs("minOccurs", "1")
        max_occurs_s = occurs("maxOccurs", "1")
        max_occurs = -1 if max_occurs_s == "unbounded" else int(max_occurs_s)

        ref_s = node.get("ref")
        if not name and ref_s:
            return XsdElement(
                name="",
                type_ref=(XS_NS, "string"),  # placeholder until resolution
                min_occurs=int(min_occurs),
                max_occurs=max_occurs,
                ref=_split_type(ref_s, self._ns(node), tns),
            )

        type_s = node.get("type")
        if type_s is not None:
            type_ref = _split_type(type_s, self._ns(node), tns)
        else:
            # anonymous inline type → synthesize "<name>Type"
            # (reference: XMLToAvroSchema.scala:287-297)
            synth = f"{name}Type"
            type_ref = None
            for child in node:
                tag = _local(child.tag)
                if tag == "complexType":
                    type_ref = self._parse_complex_type(child, synth, tns)
                elif tag == "simpleType":
                    type_ref = self._parse_simple_type(child, synth, tns)
            if type_ref is None:
                type_ref = (XS_NS, "string")
        return XsdElement(
            name=name,
            type_ref=type_ref,
            min_occurs=int(min_occurs),
            max_occurs=max_occurs,
        )

    # ------------------------------------------------------------- generate

    def spark_type_of(
        self, type_ref: tuple[str, str], rich_types: bool = False
    ) -> DataType:
        """Resolve a type reference to a Spark ``DataType``."""
        ns, name = type_ref
        if type_ref in self.complex_types:
            return self.struct_for(name, ns, rich_types=rich_types)
        if type_ref in self.simple_types:
            st = self.simple_types[type_ref]
            # enum and facet restrictions collapse to the base primitive;
            # enum → string (SURVEY.md §1.2)
            if st.enum_values:
                return StringType()
            return self._primitive(st.base_ref[1], rich_types)
        # fall back by local name regardless of ns (reference treats any
        # prefix:primitive by suffix — XMLToAvroSchema.scala:332-346)
        return self._primitive(name, rich_types)

    def _primitive(self, local_name: str, rich_types: bool) -> DataType:
        table = dict(_PRIMITIVES)
        if rich_types:
            table.update(_RICH_OVERRIDES)
        if local_name in table:
            return table[local_name]
        lowered = local_name.lower()
        for suffix in _SUFFIX_ORDER:
            if lowered.endswith(suffix.lower()):
                return table[suffix]
        raise ValueError(f"unmapped XSD type: {local_name}")

    def struct_for(
        self, type_name: str, ns: str | None = None, rich_types: bool = False
    ) -> StructType:
        """Build the ``StructType`` for a named complex type.

        This replaces the reference's generate-then-search flow
        (generateAvroSchema + recordSchema name search,
        XmlAvroHelper.scala:45-63): we build the separator-tag type's
        struct directly from the graph.
        """
        key = self._resolve_key(type_name, ns, self.complex_types)
        ct = self._with_inherited(key)
        elements = [
            r for e in ct.elements for r in self._deref_element(e)
        ]
        attributes = list(ct.attributes)
        for gkey in ct.deferred_attr_groups:
            entry = self.attr_groups.get(gkey) or next(
                (v for k, v in self.attr_groups.items() if k[1] == gkey[1]),
                None,
            )
            if entry is None:
                continue
            gnode, gscopes = entry
            prev = self._scopes
            self._scopes = gscopes
            try:
                for child in gnode:
                    if _local(child.tag) == "attribute":
                        attributes.append(
                            self._parse_attribute(child, gkey[0])
                        )
            finally:
                self._scopes = prev
        fields: list[StructField] = []
        element_names = {e.name for e in elements}

        # attributes first, matching the reference's field order
        # (XMLToAvroSchema.scala:92-116 emits attributes before elements)
        for attr in attributes:
            fname = attr.name if attr.name not in element_names else f"_{attr.name}"
            fields.append(
                StructField(
                    fname,
                    self.spark_type_of(attr.type_ref, rich_types),
                    nullable=not attr.required,
                    metadata={"xmlKind": "attribute", "xmlName": attr.name},
                )
            )
        if ct.simple_content_base is not None:
            fields.append(
                StructField(
                    "_Value",
                    self.spark_type_of(ct.simple_content_base, rich_types),
                    nullable=True,
                    metadata={"xmlKind": "text"},
                )
            )
        for elm in elements:
            etype = self.spark_type_of(elm.type_ref, rich_types)
            meta = {"xmlKind": "element", "xmlName": elm.name}
            if elm.max_occurs == -1 or elm.max_occurs > 1:
                fields.append(
                    StructField(
                        elm.name,
                        ArrayType(etype, containsNull=False),
                        nullable=elm.min_occurs == 0,
                        metadata=meta,
                    )
                )
            else:
                fields.append(
                    StructField(
                        elm.name, etype, nullable=elm.min_occurs == 0, metadata=meta
                    )
                )
        return StructType(fields)

    def _deref_element(self, elm: XsdElement) -> list[XsdElement]:
        """Resolve an ``<xs:element ref=...>`` against the global element
        table: name and type come from the target, occurs stay the ref
        site's. A target that heads a SUBSTITUTION GROUP expands to the
        whole group — head (unless abstract) plus every member, all
        optional, the standard relational flattening of "any of these
        elements may appear here". Unresolvable refs drop silently (the
        pre-support behavior — never an error)."""
        if elm.group_ref is not None:
            # deferred model group: the definition may have been parsed
            # after the use site (cross-file includes in any order) —
            # retry against the now-complete registry
            entry = self.model_groups.get(elm.group_ref)
            if entry is None:
                matches = [v for k, v in self.model_groups.items()
                           if k[1] == elm.group_ref[1]]
                entry = matches[0] if matches else None
            if entry is None:
                return []
            gnode, gscopes = entry
            tmp = XsdComplexType(name="", ns=elm.group_ref[0])
            prev = self._scopes
            self._scopes = gscopes
            try:
                for child in gnode:
                    tag = _local(child.tag)
                    if tag in ("sequence", "all"):
                        self._parse_sequence(child, tmp, elm.group_ref[0])
                    elif tag == "choice":
                        self._parse_choice(child, tmp, elm.group_ref[0])
            finally:
                self._scopes = prev
            return [r for e in tmp.elements for r in self._deref_element(e)]
        if elm.ref is None:
            return [elm]
        key = elm.ref
        target = self.root_elements.get(key)
        if target is None:
            matches = [(k, v) for k, v in self.root_elements.items()
                       if k[1] == key[1]]
            if not matches:
                return []
            key, target = matches[0]
        members = self.substitution_members.get(key, [])
        out: list[XsdElement] = []
        if key not in self.abstract_elements:
            out.append(XsdElement(
                name=target.name,
                type_ref=target.type_ref,
                min_occurs=0 if members else elm.min_occurs,
                max_occurs=elm.max_occurs,
            ))
        for m in members:
            out.append(XsdElement(
                name=m.name,
                type_ref=m.type_ref,
                min_occurs=0,  # exclusive alternatives → all optional
                max_occurs=elm.max_occurs,
            ))
        return out

    def _with_inherited(self, key: tuple[str, str]) -> XsdComplexType:
        """The type with its complexContent base chain spliced in,
        base-first (XML serializes inherited content before the derived
        type's own). Resolved lazily so the base may be defined in any
        file/order; a cyclic or missing base just stops the walk."""
        ct = self.complex_types[key]
        if ct.complex_content_base is None:
            return ct
        chain: list[XsdComplexType] = []
        # seed with the starting type: a cyclic chain (A extends B
        # extends A) must stop when it comes back around, not append
        # the derived type twice and emit duplicate struct fields
        seen: set[tuple[str, str]] = {key}
        cur: XsdComplexType | None = ct
        while cur is not None:
            chain.append(cur)
            base = cur.complex_content_base
            cur = None
            if base is not None and base not in seen:
                seen.add(base)
                cur = self.complex_types.get(base) or self.complex_types.get(
                    (ct.ns, base[1])
                )
        merged = XsdComplexType(name=ct.name, ns=ct.ns)
        for part in reversed(chain):  # base-first
            merged.attributes.extend(part.attributes)
            merged.deferred_attr_groups.extend(part.deferred_attr_groups)
            merged.elements.extend(part.elements)
            if part.simple_content_base is not None:
                merged.simple_content_base = part.simple_content_base
        return merged

    def struct_for_root_element(
        self, element_name: str, ns: str | None = None, rich_types: bool = False
    ) -> StructType:
        key = self._resolve_key(element_name, ns, self.root_elements)
        elm = self.root_elements[key]
        t = self.spark_type_of(elm.type_ref, rich_types)
        if not isinstance(t, StructType):
            raise ValueError(f"root element {element_name} is not a complex type")
        return t

    def _resolve_key(
        self, name: str, ns: str | None, table: dict[tuple[str, str], object]
    ) -> tuple[str, str]:
        if ns is not None and (ns, name) in table:
            return (ns, name)
        # name-only search, matching the reference's separator-tag-type
        # lookup which searches by record name alone
        # (XmlAvroHelper.scala:45-63)
        matches = [k for k in table if k[1] == name]
        if not matches:
            raise KeyError(f"type/element not found in XSD graph: {name}")
        return matches[0]


def xsd_to_struct(
    xsd_path: str | Path,
    separator_tag_type: str,
    ns: str | None = None,
    rich_types: bool = False,
) -> StructType:
    """One-call API: XSD file or directory → ``StructType`` of the
    separator-tag type (the row schema).

    Equivalent of the reference's full DDL-side flow
    (XmlAvroHelper.scala:88-107): parse schema dir, generate schema,
    locate separator-tag sub-schema.
    """
    p = Path(xsd_path)
    graph = XsdGraph.parse_dir(p) if p.is_dir() else XsdGraph.parse_file(p)
    return graph.struct_for(separator_tag_type, ns, rich_types=rich_types)


# ------------------------------------------------------------------ helpers


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _split_type(type_s: str, nsmap: dict[str, str], tns: str) -> tuple[str, str]:
    """Resolve ``pfx:name`` to ``(namespace_uri, name)`` (reference:
    splitType + per-node scope resolution, XMLToAvroSchema.scala:318-327)."""
    if ":" in type_s:
        pfx, name = type_s.split(":", 1)
        return (nsmap.get(pfx, tns), name)
    return (nsmap.get("", tns), type_s)


_NS_MISSING = object()


def _parse_with_scopes(
    xsd_text: str,
) -> tuple[ET.Element, dict[int, dict[str, str]]]:
    """Parse the document and record each element's *effective* prefix→URI
    map, honoring per-node scope and shadowing (reference resolves
    prefixes against the declaring node's scope —
    XMLToAvroSchema.scala:312-313, splitType :318-327).

    ElementTree drops xmlns declarations from attributes, so they are
    captured via the pull-parser's start-ns events and folded along the
    element stack."""
    import io

    scopes: dict[int, dict[str, str]] = {}
    current: dict[str, str] = {}
    pending: list[tuple[str, str]] = []
    undo_stack: list[list[tuple[str, object]]] = []
    root: ET.Element | None = None
    for event, payload in ET.iterparse(
        io.StringIO(xsd_text), events=("start", "end", "start-ns")
    ):
        if event == "start-ns":
            pending.append(payload)
        elif event == "start":
            undo: list[tuple[str, object]] = []
            for pfx, uri in pending:
                undo.append((pfx, current.get(pfx, _NS_MISSING)))
                current[pfx] = uri
            pending = []
            undo_stack.append(undo)
            scopes[id(payload)] = dict(current)
            if root is None:
                root = payload
        else:  # end — restore the enclosing scope
            for pfx, old in reversed(undo_stack.pop()):
                if old is _NS_MISSING:
                    current.pop(pfx, None)
                else:
                    current[pfx] = old  # type: ignore[assignment]
    if root is None:
        raise ValueError("empty XSD document")
    return root, scopes


# ------------------------------------------------------- inverse direction


def struct_to_xsd(
    struct: StructType,
    row_tag: str,
    row_type_name: str | None = None,
    rich_types: bool = False,
) -> str:
    """INVERSE converter: ``StructType`` → XSD document (the direction
    the reference lacks — XMLToAvroSchema.scala is one-way). Emits one
    ``xs:complexType`` per struct level (anonymous nested structs get
    the reference's ``<name>Type`` synthetic naming convention,
    XMLToAvroSchema.scala:287-297) with the §1.2 primitive table
    inverted: Long→xs:long, Integer→xs:int, Double→xs:double,
    Float→xs:float, Boolean→xs:boolean, String→xs:string (+
    Date→xs:date / Timestamp→xs:dateTime when ``rich_types``).
    ``nullable`` → ``minOccurs="0"`` and ``ArrayType`` →
    ``maxOccurs="unbounded"`` — exactly the cardinality rules
    ``struct_for`` applies forward, so
    ``xsd_to_struct(struct_to_xsd(s)) == s`` round-trips (pinned in
    tests/test_xsd.py). Generated XSDs make any DataFrame's schema
    shippable to ANY consumer of the reference's XSD contract."""
    from pyspark.sql import types as T

    prim = {
        T.LongType(): "xs:long",
        T.IntegerType(): "xs:int",
        T.DoubleType(): "xs:double",
        T.FloatType(): "xs:float",
        T.BooleanType(): "xs:boolean",
        T.StringType(): "xs:string",
    }
    if rich_types:
        prim[T.DateType()] = "xs:date"
        prim[T.TimestampType()] = "xs:dateTime"
    else:
        prim[T.DateType()] = "xs:string"
        prim[T.TimestampType()] = "xs:string"

    complex_types: list[str] = []

    def type_of(name: str, dt, lines: list[str]) -> str:
        if isinstance(dt, T.StructType):
            tname = f"{name}Type"
            emit_complex(tname, dt)
            return tname
        if dt in prim:
            return prim[dt]
        raise ValueError(f"struct_to_xsd: unsupported type {dt} at {name}")

    def emit_complex(tname: str, st: T.StructType) -> None:
        lines = [f'  <xs:complexType name="{tname}">', "    <xs:sequence>"]
        for f in st.fields:
            dt, lo, hi = f.dataType, (0 if f.nullable else 1), 1
            if isinstance(dt, T.ArrayType):
                if isinstance(dt.elementType, T.ArrayType):
                    raise ValueError(
                        "struct_to_xsd: nested arrays need a wrapper struct"
                    )
                dt, lo, hi = dt.elementType, 0, -1
            tn = type_of(f.name, dt, lines)
            occurs = f'minOccurs="{lo}"'
            if hi == -1:
                occurs += ' maxOccurs="unbounded"'
            lines.append(
                f'      <xs:element name="{f.name}" type="{tn}" {occurs}/>'
            )
        lines += ["    </xs:sequence>", "  </xs:complexType>"]
        complex_types.append("\n".join(lines))

    rname = row_type_name or f"{row_tag}Type"
    emit_complex(rname, struct)
    body = "\n".join(complex_types)
    return (
        '<?xml version="1.0"?>\n'
        '<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">\n'
        f'  <xs:element name="{row_tag}" type="{rname}"/>\n'
        f"{body}\n"
        "</xs:schema>\n"
    )
