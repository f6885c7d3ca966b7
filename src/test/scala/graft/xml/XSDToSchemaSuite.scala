package graft.xml

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class XSDToSchemaSuite extends AnyFunSuite {

  test("basic sequence of simple types") {
    val xsd =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="book">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="title" type="xs:string"/>
        |        <xs:element name="price" type="xs:double"/>
        |        <xs:element name="year" type="xs:long" minOccurs="0"/>
        |        <xs:element name="pages" type="xs:int"/>
        |      </xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    val st = XSDToSchema.read(xsd)
    assert(st.fieldNames.toSeq === Seq("book"))
    val book = st("book").dataType.asInstanceOf[StructType]
    assert(book("title").dataType === StringType)
    assert(book("price").dataType === DoubleType)
    assert(book("year").dataType === LongType)
    assert(book("year").nullable)
    assert(book("pages").dataType === IntegerType)
  }

  test("maxOccurs unbounded becomes ArrayType") {
    val xsd =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="basket">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="item" type="xs:string" maxOccurs="unbounded"/>
        |      </xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    val basket = XSDToSchema.read(xsd)("basket").dataType.asInstanceOf[StructType]
    assert(basket("item").dataType === ArrayType(StringType))
  }

  test("attributes with prefix and choice members optional") {
    val xsd =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="rec">
        |    <xs:complexType>
        |      <xs:choice>
        |        <xs:element name="a" type="xs:long"/>
        |        <xs:element name="b" type="xs:string"/>
        |      </xs:choice>
        |      <xs:attribute name="id" type="xs:string" use="required"/>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    val rec = XSDToSchema.read(xsd)("rec").dataType.asInstanceOf[StructType]
    // Declaration order, children before attributes (reference convention).
    assert(rec.fieldNames.toSeq === Seq("a", "b", "_id"))
    assert(!rec("_id").nullable)
    assert(rec("a").nullable && rec("b").nullable)
  }

  test("decimal with fraction digits; date and dateTime") {
    val xsd =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="m">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="amount">
        |          <xs:simpleType>
        |            <xs:restriction base="xs:decimal">
        |              <xs:fractionDigits value="2"/>
        |            </xs:restriction>
        |          </xs:simpleType>
        |        </xs:element>
        |        <xs:element name="d" type="xs:date"/>
        |        <xs:element name="ts" type="xs:dateTime"/>
        |      </xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    val m = XSDToSchema.read(xsd)("m").dataType.asInstanceOf[StructType]
    assert(m("amount").dataType === DecimalType(38, 2))
    assert(m("d").dataType === DateType)
    assert(m("ts").dataType === TimestampType)
  }

  test("xs:any becomes wildcard column") {
    val xsd =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="r">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="k" type="xs:long"/>
        |        <xs:any processContents="skip" minOccurs="0" maxOccurs="unbounded"/>
        |      </xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    val r = XSDToSchema.read(xsd)("r").dataType.asInstanceOf[StructType]
    assert(r("xs_any").dataType === ArrayType(StringType))
  }

  test("rowValidationXSDPath drops records failing XSD validation") {
    val spark = SparkTestSession.spark
    val tmp = Files.createTempDirectory("graft-xsd")
    val xsdPath = tmp.resolve("row.xsd")
    Files.writeString(xsdPath,
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="ROW">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="year" type="xs:long"/>
        |      </xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin)
    val xmlPath = tmp.resolve("data.xml")
    Files.writeString(xmlPath,
      """<ROWS>
        |  <ROW><year>2001</year></ROW>
        |  <ROW><bad>x</bad></ROW>
        |  <ROW><year>2002</year></ROW>
        |</ROWS>""".stripMargin)
    val df = spark.read.format("graft.xml")
      .option("rowTag", "ROW")
      .option("mode", "DROPMALFORMED")
      .option("rowValidationXSDPath", xsdPath.toString)
      .load(xmlPath.toString)
    assert(df.count() === 2)
    assert(df.select("year").collect().map(_.getLong(0)).sorted.toSeq === Seq(2001L, 2002L))
  }

  test("element ref resolves to the referenced declaration (reference parity, issue 617)") {
    // An xs:element with ref= must expand to the referenced element's full
    // type, including inside repeated (array) contexts.
    val xsd =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="album">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="title" type="xs:string"/>
        |        <xs:element name="artist" type="xs:string"/>
        |        <xs:element name="catno" type="xs:string"/>
        |      </xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |  <xs:element name="shelf" type="Shelf"/>
        |  <xs:complexType name="Shelf">
        |    <xs:sequence>
        |      <xs:element ref="album" minOccurs="0" maxOccurs="unbounded"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin
    val st = XSDToSchema.read(xsd)
    val album = st("album").dataType.asInstanceOf[StructType]
    assert(album.fieldNames.toSeq === Seq("title", "artist", "catno"))
    val list = st("shelf").dataType.asInstanceOf[StructType]
    val arr = list("album").dataType.asInstanceOf[ArrayType]
    val inner = arr.elementType.asInstanceOf[StructType]
    assert(inner.fieldNames.toSeq === Seq("title", "artist", "catno"))
    assert(inner("catno").dataType === StringType)
  }

  test("complexContent extension appends to the base type (reference parity, issue 554)") {
    val xsd =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="member" type="fullcontact"/>
        |  <xs:complexType name="namepart">
        |    <xs:sequence>
        |      <xs:element name="given" type="xs:string"/>
        |      <xs:element name="family" type="xs:string"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |  <xs:complexType name="fullcontact">
        |    <xs:complexContent>
        |      <xs:extension base="namepart">
        |        <xs:sequence>
        |          <xs:element name="street" type="xs:string"/>
        |          <xs:element name="town" type="xs:string"/>
        |          <xs:element name="nation" type="xs:string"/>
        |        </xs:sequence>
        |      </xs:extension>
        |    </xs:complexContent>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin
    val emp = XSDToSchema.read(xsd)("member").dataType.asInstanceOf[StructType]
    assert(emp.fieldNames.toSeq ===
      Seq("given", "family", "street", "town", "nation"))
    assert(emp.fields.forall(_.dataType === StringType))
  }
}
