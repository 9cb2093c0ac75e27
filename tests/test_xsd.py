"""Unit tests for the XSD→StructType converter (SURVEY.md §5: exact
expected schemas for the fixture trio, plus parity checks against the
reference's own fixtures when the reference tree is present)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from tests.conftest import FIXTURES, REFERENCE_FIXTURES
from xml_hive_spark.xsd import XsdGraph, xsd_to_struct


def _names_types(struct: StructType) -> list[tuple[str, str, bool]]:
    return [(f.name, f.dataType.simpleString(), f.nullable) for f in struct.fields]


class TestBooksFixture:
    def test_book_struct(self):
        st = xsd_to_struct(FIXTURES / "books" / "schema.xsd", "bookType")
        assert _names_types(st) == [
            ("id", "string", True),  # optional attribute → nullable
            ("author", "string", False),
            ("title", "string", False),
            ("genre", "string", False),
            ("price", "float", False),
            ("publish_date", "string", False),  # xs:date → string (parity)
            ("description", "string", False),
            ("tag", "array<string>", True),  # maxOccurs unbounded, minOccurs 0
        ]

    def test_catalog_root(self):
        g = XsdGraph.parse_file(FIXTURES / "books" / "schema.xsd")
        root = g.struct_for_root_element("catalog")
        assert root.fieldNames() == ["book"]
        assert isinstance(root["book"].dataType, ArrayType)
        assert isinstance(root["book"].dataType.elementType, StructType)

    def test_rich_types_opt_in(self):
        st = xsd_to_struct(
            FIXTURES / "books" / "schema.xsd", "bookType", rich_types=True
        )
        assert st["publish_date"].dataType.simpleString() == "date"
        assert st["price"].dataType == FloatType()


class TestMembersFixture:
    """Venetian-blind style: anonymous inline complexType, attribute-only
    rows; synthesized type name ``<element>Type``."""

    def test_anonymous_type_synthesis(self):
        g = XsdGraph.parse_file(FIXTURES / "members" / "schema.xsd")
        st = g.struct_for("PlayerType")
        assert _names_types(st) == [
            ("Alias", "string", True),
            ("Squad", "string", True),
        ]

    def test_namespace_keyed(self):
        g = XsdGraph.parse_file(FIXTURES / "members" / "schema.xsd")
        st = g.struct_for("PlayerType", ns="http://example.org/members")
        assert st.fieldNames() == ["Alias", "Squad"]


class TestNestedFixture:
    """Nested anonymous simpleType w/ integer restriction: facets ignored,
    ``integer`` → int via suffix rule."""

    def test_nested_simple_type(self):
        g = XsdGraph.parse_file(FIXTURES / "nested" / "schema.xsd")
        st = g.struct_for("EntryType")
        assert _names_types(st) == [
            ("Handle", "string", True),
            ("Region", "string", True),
            ("Score", "int", False),
        ]


class TestPrimitiveMapping:
    def test_suffix_fallback(self):
        g = XsdGraph()
        assert g._primitive("nonNegativeInteger", False) == IntegerType()
        assert g._primitive("normalizedString", False) == StringType()
        with pytest.raises(ValueError):
            g._primitive("base64Binary", False)  # unmapped, parity

    def test_enum_collapses_to_string(self):
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:simpleType name="colorType">
            <xs:restriction base="xs:string">
              <xs:enumeration value="red"/><xs:enumeration value="blue"/>
            </xs:restriction>
          </xs:simpleType>
          <xs:complexType name="itemType">
            <xs:sequence><xs:element name="color" type="colorType"/></xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("itemType")
        assert st["color"].dataType == StringType()

    def test_simple_content_value_field(self):
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:complexType name="priceType">
            <xs:simpleContent>
              <xs:extension base="xs:double">
                <xs:attribute name="currency" type="xs:string" use="required"/>
              </xs:extension>
            </xs:simpleContent>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("priceType")
        assert _names_types(st) == [
            ("currency", "string", False),
            ("_Value", "double", True),
        ]

    def test_attribute_element_collision_prefixed(self):
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:complexType name="cType">
            <xs:sequence><xs:element name="name" type="xs:string"/></xs:sequence>
            <xs:attribute name="name" type="xs:string"/>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("cType")
        assert st.fieldNames() == ["_name", "name"]

    def test_choice_every_branch_optional(self):
        """Beyond-reference (it raises on xs:choice): each branch of an
        exclusive alternative becomes a NULLABLE field, including a
        required element inside a choice branch."""
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:complexType name="cType">
            <xs:sequence>
              <xs:element name="always" type="xs:string"/>
              <xs:choice>
                <xs:element name="a" type="xs:string"/>
                <xs:element name="b" type="xs:int" minOccurs="1"/>
                <xs:sequence>
                  <xs:element name="c" type="xs:string"/>
                </xs:sequence>
              </xs:choice>
            </xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("cType")
        assert st.fieldNames() == ["always", "a", "b", "c"]
        assert not st["always"].nullable
        for f in ("a", "b", "c"):
            assert st[f].nullable, f

    def test_union_widens_to_string(self):
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:simpleType name="intOrWord">
            <xs:union memberTypes="xs:int xs:string"/>
          </xs:simpleType>
          <xs:complexType name="cType">
            <xs:sequence>
              <xs:element name="v" type="intOrWord"/>
            </xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("cType")
        assert st["v"].dataType.simpleString() == "string"

    def test_list_keeps_lexical_string(self):
        """xs:list (space-separated items) keeps its lexical form as
        string — explicit widening, not an accidental default; the
        reference raises on xs:list entirely."""
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:simpleType name="intList">
            <xs:list itemType="xs:int"/>
          </xs:simpleType>
          <xs:complexType name="cType">
            <xs:sequence>
              <xs:element name="vals" type="intList"/>
            </xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("cType")
        assert st["vals"].dataType.simpleString() == "string"


@pytest.mark.skipif(
    not REFERENCE_FIXTURES.exists(), reason="reference tree not mounted"
)
class TestReferenceParity:
    """Parity with the reference's own fixtures (read at test time from the
    read-only reference tree; golden schemas per FIXTURES.md)."""

    def test_testdata1_books(self):
        st = xsd_to_struct(
            REFERENCE_FIXTURES / "testdata1" / "schema" / "schema.xsd", "bookType"
        )
        assert _names_types(st) == [
            ("id", "string", True),
            ("author", "string", False),
            ("title", "string", False),
            ("genre", "string", False),
            ("price", "float", False),
            ("publish_date", "string", False),
            ("description", "string", False),
        ]

    def test_testdata2_member_attrs(self):
        st = xsd_to_struct(
            REFERENCE_FIXTURES / "testdata2" / "schema" / "schema.xsd", "MemberType"
        )
        assert _names_types(st) == [
            ("FirstName", "string", True),
            ("LastName", "string", True),
        ]

    def test_testdata3_member_nested(self):
        st = xsd_to_struct(
            REFERENCE_FIXTURES / "testdata3" / "schema" / "schema.xsd", "MemberType"
        )
        assert _names_types(st) == [
            ("FirstName", "string", True),
            ("LastName", "string", True),
            ("Age", "int", False),
        ]


class TestPerNodeNamespaceScope:
    """Prefix shadowing: an inner element redeclares a prefix bound to a
    different URI on an ancestor. Resolution must use the DECLARING node's
    scope (reference: per-node splitType, XMLToAvroSchema.scala:312-313,
    318-327) — a document-level map mis-resolves the outer reference."""

    XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:p="urn:outer" targetNamespace="urn:outer">
  <xs:complexType name="OuterType">
    <xs:sequence>
      <!-- p: resolves to urn:outer here -->
      <xs:element name="outer_child" type="p:LeafType"/>
      <xs:sequence xmlns:p="urn:inner">
        <!-- p: SHADOWED to urn:inner for this subtree -->
        <xs:element name="inner_child" type="p:LeafType"/>
      </xs:sequence>
    </xs:sequence>
  </xs:complexType>
  <xs:complexType name="LeafType">
    <xs:sequence>
      <xs:element name="v" type="xs:int"/>
    </xs:sequence>
  </xs:complexType>
</xs:schema>"""

    XSD_INNER = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           targetNamespace="urn:inner">
  <xs:complexType name="LeafType">
    <xs:sequence>
      <xs:element name="s" type="xs:string"/>
    </xs:sequence>
  </xs:complexType>
</xs:schema>"""

    def test_shadowed_prefix_resolves_per_scope(self):
        from xml_hive_spark.xsd import XsdGraph

        g = XsdGraph()
        g.parse_source(self.XSD)
        g.parse_source(self.XSD_INNER)
        ot = g.complex_types[("urn:outer", "OuterType")]
        refs = {e.name: e.type_ref for e in ot.elements}
        assert refs["outer_child"] == ("urn:outer", "LeafType")
        assert refs["inner_child"] == ("urn:inner", "LeafType")
        # end-to-end: the two children get the *different* leaf structs
        st = g.struct_for("OuterType", "urn:outer")
        assert st["outer_child"].dataType.fieldNames() == ["v"]
        assert st["inner_child"].dataType.fieldNames() == ["s"]


class TestGroupRefs:
    """xs:group / xs:attributeGroup reference splicing — BEYOND the
    reference, which has no group support at all."""

    GROUPED = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:complexType name="person">
        <xs:sequence>
          <xs:group ref="nameGroup"/>
          <xs:element name="age" type="xs:int"/>
        </xs:sequence>
        <xs:attributeGroup ref="idAttrs"/>
      </xs:complexType>
      <xs:group name="nameGroup">
        <xs:sequence>
          <xs:element name="first" type="xs:string"/>
          <xs:element name="last" type="xs:string"/>
        </xs:sequence>
      </xs:group>
      <xs:attributeGroup name="idAttrs">
        <xs:attribute name="id" type="xs:long" use="required"/>
        <xs:attribute name="rev" type="xs:int"/>
      </xs:attributeGroup>
    </xs:schema>"""

    def test_groups_splice_inline(self):
        """Definition-after-use in the same file resolves (pre-pass);
        elements and attributes land with their declared types and
        cardinality."""
        g = XsdGraph()
        g.parse_source(self.GROUPED)
        st = g.struct_for("person")
        got = [(f.name, f.dataType.simpleString(), f.nullable)
               for f in st.fields]
        assert got == [
            ("id", "bigint", False),
            ("rev", "int", True),
            ("first", "string", False),
            ("last", "string", False),
            ("age", "int", False),
        ]

    def test_cyclic_group_ref_terminates(self):
        """A self-referencing group must splice once, not recurse."""
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:group name="loop">
            <xs:sequence>
              <xs:element name="x" type="xs:int"/>
              <xs:group ref="loop"/>
            </xs:sequence>
          </xs:group>
          <xs:complexType name="c">
            <xs:sequence><xs:group ref="loop"/></xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("c")
        assert [f.name for f in st.fields] == ["x"]

    def test_missing_group_ref_is_silently_empty(self):
        """An unresolvable ref splices nothing (the pre-support
        behavior), never raises."""
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:complexType name="c">
            <xs:sequence>
              <xs:group ref="nowhere"/>
              <xs:element name="k" type="xs:string"/>
            </xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        assert [f.name for f in g.struct_for("c").fields] == ["k"]

    def test_group_schema_reads_xml_end_to_end(self, spark, tmp_path):
        """The spliced schema drives a real read: all group-derived
        fields extract from records."""
        from xml_hive_spark.reader import read_xml

        g = XsdGraph()
        g.parse_source(self.GROUPED)
        schema = g.struct_for("person")
        p = tmp_path / "people.xml"
        p.write_text(
            "<people>"
            '<p id="1" rev="2"><first>Ada</first><last>L</last>'
            "<age>36</age></p>"
            '<p id="2"><first>Alan</first><last>T</last><age>41</age></p>'
            "</people>"
        )
        rows = sorted(
            map(tuple, read_xml(spark, str(p), "p", schema=schema).collect())
        )
        assert rows == [
            (1, 2, "Ada", "L", 36),
            (2, None, "Alan", "T", 41),
        ]


class TestComplexContent:
    """xs:complexContent extension (type inheritance) — BEYOND the
    reference, which drops the construct entirely."""

    XSD = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:complexType name="vehicle">
        <xs:sequence>
          <xs:element name="make" type="xs:string"/>
          <xs:element name="year" type="xs:int"/>
        </xs:sequence>
        <xs:attribute name="vin" type="xs:string" use="required"/>
      </xs:complexType>
      <xs:complexType name="car">
        <xs:complexContent>
          <xs:extension base="vehicle">
            <xs:sequence>
              <xs:element name="doors" type="xs:int"/>
            </xs:sequence>
            <xs:attribute name="trim" type="xs:string"/>
          </xs:extension>
        </xs:complexContent>
      </xs:complexType>
    </xs:schema>"""

    def test_extension_inherits_base_first(self):
        g = XsdGraph()
        g.parse_source(self.XSD)
        st = g.struct_for("car")
        assert _names_types(st) == [
            ("vin", "string", False),
            ("trim", "string", True),
            ("make", "string", False),
            ("year", "int", False),
            ("doors", "int", False),
        ]

    def test_base_type_unaffected(self):
        g = XsdGraph()
        g.parse_source(self.XSD)
        assert [f.name for f in g.struct_for("vehicle").fields] == [
            "vin", "make", "year",
        ]

    def test_restriction_uses_own_content_only(self):
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:complexType name="base">
            <xs:sequence>
              <xs:element name="a" type="xs:string"/>
              <xs:element name="b" type="xs:int"/>
            </xs:sequence>
          </xs:complexType>
          <xs:complexType name="narrow">
            <xs:complexContent>
              <xs:restriction base="base">
                <xs:sequence><xs:element name="a" type="xs:string"/></xs:sequence>
              </xs:restriction>
            </xs:complexContent>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        assert [f.name for f in g.struct_for("narrow").fields] == ["a"]

    def test_extension_schema_reads_xml_end_to_end(self, spark, tmp_path):
        from xml_hive_spark.reader import read_xml

        g = XsdGraph()
        g.parse_source(self.XSD)
        schema = g.struct_for("car")
        p = tmp_path / "cars.xml"
        p.write_text(
            "<lot>"
            '<car vin="V1" trim="GT"><make>A</make><year>2020</year>'
            "<doors>2</doors></car>"
            '<car vin="V2"><make>B</make><year>2021</year><doors>4</doors></car>'
            "</lot>"
        )
        rows = sorted(
            map(tuple, read_xml(spark, str(p), "car", schema=schema).collect())
        )
        assert rows == [
            ("V1", "GT", "A", 2020, 2),
            ("V2", None, "B", 2021, 4),
        ]


class TestElementRefs:
    """<xs:element ref=...> resolution — name/type from the global
    element, occurs from the ref site. BEYOND the reference, which
    emits a nameless field for refs."""

    def test_ref_resolves_name_and_type(self):
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:element name="title" type="xs:string"/>
          <xs:complexType name="doc">
            <xs:sequence>
              <xs:element ref="title" minOccurs="0"/>
              <xs:element name="pages" type="xs:int"/>
            </xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("doc")
        assert _names_types(st) == [
            ("title", "string", True),  # ref-site minOccurs=0 wins
            ("pages", "int", False),
        ]

    def test_unresolvable_ref_drops_silently(self):
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:complexType name="doc">
            <xs:sequence>
              <xs:element ref="ghost"/>
              <xs:element name="k" type="xs:string"/>
            </xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        assert [f.name for f in g.struct_for("doc").fields] == ["k"]

    def test_ref_to_complex_global_element(self, spark, tmp_path):
        """A ref to a global element of a complex type nests its struct,
        and the whole schema drives a real read."""
        from xml_hive_spark.reader import read_xml

        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:complexType name="addr">
            <xs:sequence>
              <xs:element name="city" type="xs:string"/>
            </xs:sequence>
          </xs:complexType>
          <xs:element name="address" type="addr"/>
          <xs:complexType name="person">
            <xs:sequence>
              <xs:element name="nm" type="xs:string"/>
              <xs:element ref="address"/>
            </xs:sequence>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        schema = g.struct_for("person")
        assert schema["address"].dataType.simpleString() == \
            "struct<city:string>"
        p = tmp_path / "p.xml"
        p.write_text(
            "<ps><p><nm>A</nm><address><city>Oslo</city></address></p></ps>"
        )
        rows = [tuple(r) for r in
                read_xml(spark, str(p), "p", schema=schema).collect()]
        assert rows == [("A", ("Oslo",))]


class TestIncludeImport:
    def test_include_closure_resolves_types(self, tmp_path):
        """A single-file entry point pulls in its xs:include/xs:import
        closure (relative schemaLocation, cycles guarded)."""
        (tmp_path / "base.xsd").write_text(
            """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
              <xs:include schemaLocation="main.xsd"/>
              <xs:complexType name="addr">
                <xs:sequence><xs:element name="city" type="xs:string"/></xs:sequence>
              </xs:complexType>
            </xs:schema>"""
        )
        (tmp_path / "main.xsd").write_text(
            """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
              <xs:include schemaLocation="base.xsd"/>
              <xs:complexType name="person">
                <xs:sequence>
                  <xs:element name="nm" type="xs:string"/>
                  <xs:element name="home" type="addr"/>
                </xs:sequence>
              </xs:complexType>
            </xs:schema>"""
        )
        g = XsdGraph.parse_file(tmp_path / "main.xsd")
        st = g.struct_for("person")
        assert st["home"].dataType.simpleString() == "struct<city:string>"

    def test_missing_include_is_nonfatal(self, tmp_path):
        (tmp_path / "m.xsd").write_text(
            """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
              <xs:include schemaLocation="gone.xsd"/>
              <xs:complexType name="c">
                <xs:sequence><xs:element name="k" type="xs:string"/></xs:sequence>
              </xs:complexType>
            </xs:schema>"""
        )
        g = XsdGraph.parse_file(tmp_path / "m.xsd")
        assert [f.name for f in g.struct_for("c").fields] == ["k"]


class TestSubstitutionGroups:
    XSD = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:element name="shape" type="xs:string" abstract="true"/>
      <xs:element name="circle" type="xs:string" substitutionGroup="shape"/>
      <xs:element name="square" type="xs:int" substitutionGroup="shape"/>
      <xs:complexType name="drawing">
        <xs:sequence>
          <xs:element name="title" type="xs:string"/>
          <xs:element ref="shape"/>
        </xs:sequence>
      </xs:complexType>
    </xs:schema>"""

    def test_abstract_head_expands_to_members_only(self):
        g = XsdGraph()
        g.parse_source(self.XSD)
        st = g.struct_for("drawing")
        assert _names_types(st) == [
            ("title", "string", False),
            ("circle", "string", True),
            ("square", "int", True),
        ]

    def test_concrete_head_included_optional(self):
        xsd = self.XSD.replace(' abstract="true"', "")
        g = XsdGraph()
        g.parse_source(xsd)
        st = g.struct_for("drawing")
        assert [f.name for f in st.fields] == [
            "title", "shape", "circle", "square",
        ]
        for f in ("shape", "circle", "square"):
            assert st[f].nullable, f

    def test_substitution_read_end_to_end(self, spark, tmp_path):
        from xml_hive_spark.reader import read_xml

        g = XsdGraph()
        g.parse_source(self.XSD)
        schema = g.struct_for("drawing")
        p = tmp_path / "d.xml"
        p.write_text(
            "<ds>"
            "<d><title>a</title><circle>big</circle></d>"
            "<d><title>b</title><square>4</square></d>"
            "</ds>"
        )
        rows = sorted(
            map(tuple, read_xml(spark, str(p), "d", schema=schema).collect())
        )
        assert rows == [("a", "big", None), ("b", None, 4)]


class TestCrossFileGroups:
    """Review findings: group refs across xs:include boundaries must
    resolve regardless of file parse order, and cyclic complexContent
    chains must not duplicate fields."""

    def test_entry_uses_groups_from_included_file(self, tmp_path):
        (tmp_path / "common.xsd").write_text(
            """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
              <xs:group name="nameGroup">
                <xs:sequence>
                  <xs:element name="first" type="xs:string"/>
                </xs:sequence>
              </xs:group>
              <xs:attributeGroup name="idAttrs">
                <xs:attribute name="id" type="xs:long" use="required"/>
              </xs:attributeGroup>
            </xs:schema>"""
        )
        (tmp_path / "main.xsd").write_text(
            """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
              <xs:include schemaLocation="common.xsd"/>
              <xs:complexType name="person">
                <xs:sequence>
                  <xs:group ref="nameGroup"/>
                  <xs:element name="age" type="xs:int"/>
                </xs:sequence>
                <xs:attributeGroup ref="idAttrs"/>
              </xs:complexType>
            </xs:schema>"""
        )
        g = XsdGraph.parse_file(tmp_path / "main.xsd")
        assert [f.name for f in g.struct_for("person").fields] == [
            "id", "first", "age",
        ]

    def test_included_file_uses_entry_groups(self, tmp_path):
        """The reverse order (included complexType referencing a group
        defined in the INCLUDING file) resolves via the lazy retry."""
        (tmp_path / "types.xsd").write_text(
            """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
              <xs:complexType name="person">
                <xs:sequence>
                  <xs:group ref="nameGroup"/>
                  <xs:element name="age" type="xs:int"/>
                </xs:sequence>
                <xs:attributeGroup ref="idAttrs"/>
              </xs:complexType>
            </xs:schema>"""
        )
        (tmp_path / "main.xsd").write_text(
            """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
              <xs:include schemaLocation="types.xsd"/>
              <xs:group name="nameGroup">
                <xs:sequence>
                  <xs:element name="first" type="xs:string"/>
                </xs:sequence>
              </xs:group>
              <xs:attributeGroup name="idAttrs">
                <xs:attribute name="id" type="xs:long" use="required"/>
              </xs:attributeGroup>
            </xs:schema>"""
        )
        g = XsdGraph.parse_file(tmp_path / "main.xsd")
        assert [f.name for f in g.struct_for("person").fields] == [
            "id", "first", "age",
        ]

    def test_cyclic_inheritance_no_duplicate_fields(self):
        xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:complexType name="A">
            <xs:complexContent><xs:extension base="B">
              <xs:sequence><xs:element name="a" type="xs:string"/></xs:sequence>
            </xs:extension></xs:complexContent>
          </xs:complexType>
          <xs:complexType name="B">
            <xs:complexContent><xs:extension base="A">
              <xs:sequence><xs:element name="b" type="xs:string"/></xs:sequence>
            </xs:extension></xs:complexContent>
          </xs:complexType>
        </xs:schema>"""
        g = XsdGraph()
        g.parse_source(xsd)
        names = [f.name for f in g.struct_for("A").fields]
        assert names == ["b", "a"]  # each exactly once, base-first


# ---------------------------------------------- property: converter totality

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _schema_doc(draw):
    """Random schema exercising the full construct surface: sequences,
    choices, groups (possibly dangling/cyclic refs), attributeGroups,
    complexContent chains (possibly cyclic), element refs, substitution
    groups — the shapes the converter must never crash or loop on."""
    n_types = draw(st.integers(1, 4))
    n_groups = draw(st.integers(0, 2))
    parts = []
    type_names = [f"T{i}" for i in range(n_types)]
    group_names = [f"G{i}" for i in range(n_groups)]
    for gn in group_names:
        inner = draw(st.sampled_from(["sequence", "choice"]))
        ref = draw(st.sampled_from(group_names + ["nowhere"]))
        parts.append(
            f'<xs:group name="{gn}"><xs:{inner}>'
            f'<xs:element name="e_{gn}" type="xs:string"/>'
            f'<xs:group ref="{ref}"/>'
            f"</xs:{inner}></xs:group>"
        )
    parts.append(
        '<xs:attributeGroup name="AG">'
        '<xs:attribute name="ga" type="xs:int"/></xs:attributeGroup>'
    )
    parts.append('<xs:element name="head" type="xs:string" abstract="true"/>')
    parts.append(
        '<xs:element name="member" type="xs:int" substitutionGroup="head"/>'
    )
    for i, tn in enumerate(type_names):
        base = draw(st.sampled_from(type_names + ["missing"]))
        use_cc = draw(st.booleans())
        body = (
            f'<xs:element name="x{i}" type="xs:string" minOccurs="0"/>'
            + (f'<xs:group ref="{draw(st.sampled_from(group_names))}"/>'
               if group_names and draw(st.booleans()) else "")
            + ('<xs:element ref="head"/>' if draw(st.booleans()) else "")
            + ('<xs:element ref="ghost"/>' if draw(st.booleans()) else "")
        )
        seq = f"<xs:sequence>{body}</xs:sequence>"
        if use_cc:
            inner = (f'<xs:complexContent><xs:extension base="{base}">'
                     f"{seq}</xs:extension></xs:complexContent>")
        else:
            inner = seq + '<xs:attributeGroup ref="AG"/>'
        parts.append(f'<xs:complexType name="{tn}">{inner}</xs:complexType>')
    return (
        '<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">'
        + "".join(parts)
        + "</xs:schema>"
    )


@settings(max_examples=80, deadline=None)
@given(doc=_schema_doc())
def test_converter_total_over_generated_schemas(doc):
    """parse + struct_for must terminate without raising on any
    generated schema (dangling refs, cyclic groups, cyclic inheritance
    included), and every emitted field keeps its xmlKind metadata."""
    g = XsdGraph()
    g.parse_source(doc)
    for (ns, name) in list(g.complex_types):
        st_ = g.struct_for(name, ns)
        for f in st_.fields:
            assert f.metadata.get("xmlKind") in ("attribute", "element",
                                                 "text")
            assert f.name  # never an empty-named field (pre-ref-fix bug)


class TestStructToXsd:
    def _norm(self, dt):
        """Type tree modulo metadata / array containsNull (neither
        survives an XSD round trip by design)."""
        from pyspark.sql import types as T

        if isinstance(dt, T.StructType):
            return tuple(
                (f.name, self._norm(f.dataType), f.nullable)
                for f in dt.fields
            )
        if isinstance(dt, T.ArrayType):
            return ("array", self._norm(dt.elementType))
        return dt.simpleString()

    def test_inverse_roundtrip_semantics(self, tmp_path):
        """xsd_to_struct(struct_to_xsd(s)) must preserve names, types,
        nullability, nesting, and array cardinality."""
        from pyspark.sql.types import (
            ArrayType, BooleanType, DoubleType, FloatType, IntegerType,
            LongType, StringType, StructField, StructType,
        )

        from xml_hive_spark.xsd import struct_to_xsd, xsd_to_struct

        s = StructType([
            StructField("id", LongType(), False),
            StructField("name", StringType(), True),
            StructField("score", DoubleType(), True),
            StructField("ratio", FloatType(), False),
            StructField("n", IntegerType(), True),
            StructField("ok", BooleanType(), False),
            StructField("tags", ArrayType(StringType()), True),
            StructField("meta", StructType([
                StructField("k", IntegerType(), True),
                StructField("inner", StructType([
                    StructField("deep", StringType(), False),
                ]), True),
            ]), True),
        ])
        p = tmp_path / "gen.xsd"
        p.write_text(struct_to_xsd(s, "rec"))
        back = xsd_to_struct(p, "recType")
        assert self._norm(back) == self._norm(s)

    def test_unsupported_types_raise(self):
        from pyspark.sql.types import (
            ArrayType, MapType, StringType, StructField, StructType,
        )

        from xml_hive_spark.xsd import struct_to_xsd

        with __import__("pytest").raises(ValueError):
            struct_to_xsd(
                StructType([StructField("m", MapType(StringType(), StringType()))]),
                "rec",
            )
        with __import__("pytest").raises(ValueError):
            struct_to_xsd(
                StructType([
                    StructField("aa", ArrayType(ArrayType(StringType())))
                ]),
                "rec",
            )
