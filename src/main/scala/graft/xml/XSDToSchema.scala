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
    val fields = schema.getElements.asScala.toSeq
      .sortBy(_._1.getLocalPart)
      .map { case (_, element) =>
        StructField(element.getName, elementType(element), nullable = element.getMinOccurs == 0)
      }
    StructType(fields)
  }

  private def elementType(element: XmlSchemaElement): DataType = {
    val base = element.getSchemaType match {
      case simple: XmlSchemaSimpleType => simpleType(simple)
      case complex: XmlSchemaComplexType => complexType(complex)
      case null =>
        // unresolved/missing type → string
        StringType
    }
    if (element.getMaxOccurs > 1) ArrayType(base) else base
  }

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

  private def complexType(ct: XmlSchemaComplexType): DataType = {
    val options = XmlOptions()
    ct.getContentModel match {
      case simple: XmlSchemaSimpleContent =>
        // Text value + attributes → struct with valueTag.
        simple.getContent match {
          case ext: XmlSchemaSimpleContentExtension =>
            val valueType = Option(new XmlSchemaCollection()
              .getTypeByQName(ext.getBaseTypeName)) match {
              case Some(st: XmlSchemaSimpleType) => simpleType(st)
              case _ => baseByQName(ext.getBaseTypeName)
            }
            val attrs = ext.getAttributes.asScala.toSeq.collect {
              case a: XmlSchemaAttribute =>
                StructField(options.attributePrefix + a.getName,
                  attributeType(a), nullable = a.getUse != XmlSchemaUse.REQUIRED)
            }
            if (attrs.isEmpty) valueType
            else StructType((attrs :+
              StructField(options.valueTag, valueType, nullable = true)).sortBy(_.name))
          case _ => StringType
        }
      case _ =>
        val particleFields: Seq[StructField] = Option(ct.getParticle).toSeq.flatMap(particle)
        val attrFields = ct.getAttributes.asScala.toSeq.collect {
          case a: XmlSchemaAttribute =>
            StructField(options.attributePrefix + a.getName,
              attributeType(a), nullable = a.getUse != XmlSchemaUse.REQUIRED)
        }
        val all = attrFields ++ particleFields
        if (all.isEmpty) StringType
        else StructType(all.sortBy(_.name))
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

  private def particle(p: XmlSchemaParticle): Seq[StructField] = p match {
    case seq: XmlSchemaSequence =>
      seq.getItems.asScala.toSeq.flatMap(member)
    case all: XmlSchemaAll =>
      all.getItems.asScala.toSeq.flatMap(member)
    case choice: XmlSchemaChoice =>
      // Choice members are all optional.
      choice.getItems.asScala.toSeq.flatMap(member)
        .map(f => f.copy(nullable = true))
    case _ => Nil
  }

  private def member(m: XmlSchemaObjectBase): Seq[StructField] = m match {
    case e: XmlSchemaElement =>
      val name = Option(e.getName)
        .orElse(Option(e.getRef).flatMap(r => Option(r.getTargetQName)).map(_.getLocalPart))
        .getOrElse("value")
      val dt = Option(e.getRef).flatMap(r => Option(r.getTarget)) match {
        case Some(target: XmlSchemaElement) => elementType(target)
        case _ => elementType(e)
      }
      Seq(StructField(name, dt, nullable = e.getMinOccurs == 0))
    case _: XmlSchemaAny =>
      Seq(StructField(XmlOptions.DefaultWildcardColName,
        ArrayType(StringType), nullable = true))
    case c: XmlSchemaChoice => particle(c)
    case s: XmlSchemaSequence => particle(s)
    case _ => Nil
  }
}
