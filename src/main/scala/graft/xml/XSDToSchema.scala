package graft.xml

import java.io.{File, FileInputStream, InputStreamReader, StringReader}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.ws.commons.schema._
import org.apache.ws.commons.schema.utils.XmlSchemaObjectBase
import org.apache.ws.commons.schema.constants.Constants
import org.apache.spark.sql.types._

/**
 * Derives a Spark [[StructType]] from an XSD, mirroring the capability of the
 * reference's converter (reference:
 * src/main/scala/com/databricks/spark/xml/util/XSDToSchema.scala:43-276):
 * xs:simpleType restrictions, xs:complexType with simple or complex content,
 * xs:sequence / xs:all / xs:choice particles, attribute declarations,
 * minOccurs=0 → nullable, maxOccurs>1 → ArrayType, element refs, xs:any →
 * wildcard column.
 *
 * Built on Apache `xmlschema-core` (bundled with Spark 4).
 */
object XSDToSchema {

  def read(xsdFile: File): StructType =
    read(new XmlSchemaCollection().read(
      new InputStreamReader(new FileInputStream(xsdFile), StandardCharsets.UTF_8)))

  def read(xsdString: String): StructType =
    read(new XmlSchemaCollection().read(new StringReader(xsdString)))

  private def read(schema: XmlSchema): StructType = {
    // Declaration order preserved end to end (reference parity): top-level
    // elements iterate in schema order, struct fields are children then
    // attributes, each in declaration order.
    val fields = schema.getElements.asScala.toSeq
      .map { case (_, element) =>
        StructField(element.getName, elementType(element, schema),
          nullable = element.getMinOccurs == 0)
      }
    StructType(fields)
  }

  private def elementType(element: XmlSchemaElement, schema: XmlSchema): DataType = {
    val base = element.getSchemaType match {
      case simple: XmlSchemaSimpleType => simpleType(simple)
      case complex: XmlSchemaComplexType => complexType(complex, schema)
      case null =>
        // unresolved/missing type → string
        StringType
    }
    if (element.getMaxOccurs > 1) ArrayType(base) else base
  }

  /** Resolve a named type through the schema's collection (covers types
   *  declared in this schema and its includes/imports); falls back to the
   *  schema itself when it was read outside a collection. */
  private def typeByQName(schema: XmlSchema, qn: javax.xml.namespace.QName): Option[XmlSchemaType] =
    Option(schema.getParent)
      .flatMap(c => Option(c.getTypeByQName(qn)))
      .orElse(Option(schema.getTypeByName(qn)))

  private def simpleType(st: XmlSchemaSimpleType): DataType = {
    val qn = Option(st.getQName)
      .orElse(st.getContent match {
        case r: XmlSchemaSimpleTypeRestriction => Option(r.getBaseTypeName)
        case _ => None
      })
      .orNull
    if (qn == null) StringType
    else qn match {
      case Constants.XSD_BOOLEAN => BooleanType
      case Constants.XSD_DECIMAL =>
        val frac = st.getContent match {
          case r: XmlSchemaSimpleTypeRestriction =>
            r.getFacets.asScala.collectFirst {
              case f: XmlSchemaFractionDigitsFacet => f.getValue.toString.toInt
            }
          case _ => None
        }
        frac.map(s => DecimalType(38, s)).getOrElse(DecimalType(38, 18))
      case Constants.XSD_UNSIGNEDLONG => DecimalType(38, 0)
      case Constants.XSD_DOUBLE => DoubleType
      case Constants.XSD_FLOAT => FloatType
      case Constants.XSD_BYTE => ByteType
      case Constants.XSD_SHORT | Constants.XSD_UNSIGNEDBYTE => ShortType
      case Constants.XSD_INT | Constants.XSD_UNSIGNEDSHORT => IntegerType
      case Constants.XSD_LONG | Constants.XSD_UNSIGNEDINT | Constants.XSD_INTEGER |
           Constants.XSD_NEGATIVEINTEGER | Constants.XSD_NONNEGATIVEINTEGER |
           Constants.XSD_NONPOSITIVEINTEGER | Constants.XSD_POSITIVEINTEGER => LongType
      case Constants.XSD_DATE => DateType
      case Constants.XSD_DATETIME => TimestampType
      case _ => StringType
    }
  }

  private def complexType(ct: XmlSchemaComplexType, schema: XmlSchema): DataType = {
    val options = XmlOptions()
    def attrsOf(items: Seq[XmlSchemaObjectBase]): Seq[StructField] = items.collect {
      case a: XmlSchemaAttribute =>
        StructField(options.attributePrefix + a.getName,
          attributeType(a), nullable = a.getUse != XmlSchemaUse.REQUIRED)
    }
    ct.getContentModel match {
      case simple: XmlSchemaSimpleContent =>
        // Text value + attributes → struct with valueTag.
        simple.getContent match {
          case ext: XmlSchemaSimpleContentExtension =>
            val valueType = typeByQName(schema, ext.getBaseTypeName) match {
              case Some(st: XmlSchemaSimpleType) => simpleType(st)
              case _ => baseByQName(ext.getBaseTypeName)
            }
            val attrs = attrsOf(ext.getAttributes.asScala.toSeq)
            if (attrs.isEmpty) valueType
            else StructType(
              StructField(options.valueTag, valueType, nullable = true) +: attrs)
          case _ => StringType
        }
      case complex: XmlSchemaComplexContent =>
        // Extension appends the derived particle's fields to the base
        // type's (reference parity, issue 554); restriction keeps the
        // restricted particle only.
        complex.getContent match {
          case ext: XmlSchemaComplexContentExtension =>
            val baseFields = typeByQName(schema, ext.getBaseTypeName) match {
              case Some(base: XmlSchemaComplexType) =>
                complexType(base, schema) match {
                  case st: StructType => st.fields.toSeq
                  case _ => Nil
                }
              case _ => Nil
            }
            val extended = Option(ext.getParticle).toSeq.flatMap(p => particle(p, schema))
            val attrs = attrsOf(ext.getAttributes.asScala.toSeq)
            val all = baseFields ++ extended ++ attrs
            if (all.isEmpty) StringType else StructType(all)
          case res: XmlSchemaComplexContentRestriction =>
            val fields = Option(res.getParticle).toSeq.flatMap(p => particle(p, schema))
            if (fields.isEmpty) StringType else StructType(fields)
          case _ => StringType
        }
      case _ =>
        val particleFields: Seq[StructField] =
          Option(ct.getParticle).toSeq.flatMap(p => particle(p, schema))
        val attrFields = attrsOf(ct.getAttributes.asScala.toSeq)
        val all = particleFields ++ attrFields
        if (all.isEmpty) StringType
        else StructType(all)
    }
  }

  private def baseByQName(qn: javax.xml.namespace.QName): DataType = qn match {
    case Constants.XSD_BOOLEAN => BooleanType
    case Constants.XSD_DOUBLE => DoubleType
    case Constants.XSD_FLOAT => FloatType
    case Constants.XSD_INT => IntegerType
    case Constants.XSD_LONG | Constants.XSD_INTEGER => LongType
    case Constants.XSD_DATE => DateType
    case Constants.XSD_DATETIME => TimestampType
    case Constants.XSD_DECIMAL => DecimalType(38, 18)
    case _ => StringType
  }

  private def attributeType(a: XmlSchemaAttribute): DataType =
    Option(a.getSchemaType).map(simpleType)
      .orElse(Option(a.getSchemaTypeName).map(baseByQName))
      .getOrElse(StringType)

  private def particle(p: XmlSchemaParticle, schema: XmlSchema): Seq[StructField] = p match {
    case seq: XmlSchemaSequence =>
      seq.getItems.asScala.toSeq.flatMap(m => member(m, schema))
    case all: XmlSchemaAll =>
      all.getItems.asScala.toSeq.flatMap(m => member(m, schema))
    case choice: XmlSchemaChoice =>
      // Choice members are all optional.
      choice.getItems.asScala.toSeq.flatMap(m => member(m, schema))
        .map(f => f.copy(nullable = true))
    case _ => Nil
  }

  private def member(m: XmlSchemaObjectBase, schema: XmlSchema): Seq[StructField] = m match {
    case e: XmlSchemaElement =>
      val name = Option(e.getName)
        .orElse(Option(e.getRef).flatMap(r => Option(r.getTargetQName)).map(_.getLocalPart))
        .getOrElse("value")
      val dt = Option(e.getRef).flatMap(r => Option(r.getTarget)) match {
        case Some(target: XmlSchemaElement) =>
          val t = elementType(target, schema)
          // Occurrence constraints live on the REFERENCING particle.
          if (e.getMaxOccurs > 1 && !t.isInstanceOf[ArrayType]) ArrayType(t) else t
        case _ => elementType(e, schema)
      }
      Seq(StructField(name, dt, nullable = e.getMinOccurs == 0))
    case _: XmlSchemaAny =>
      Seq(StructField(XmlOptions.DefaultWildcardColName,
        ArrayType(StringType), nullable = true))
    case c: XmlSchemaChoice => particle(c, schema)
    case s: XmlSchemaSequence => particle(s, schema)
    case _ => Nil
  }
}
