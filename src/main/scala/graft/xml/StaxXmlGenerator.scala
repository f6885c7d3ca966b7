package graft.xml

import java.sql.{Date, Timestamp}
import java.time.{Instant, LocalDate, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter

import javax.xml.stream.XMLStreamWriter

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/**
 * Serializes one external [[Row]] as an XML element tree.
 *
 * Mapping rules (reference:
 * src/main/scala/com/databricks/spark/xml/parsers/StaxXmlGenerator.scala:40-159):
 * fields named `attributePrefix + x` become attributes (written before child
 * elements), `valueTag` becomes the element's character data, arrays repeat
 * the field's element once per item, maps write keys as element names, nulls
 * are skipped unless a `nullValue` representation is configured.
 */
private[graft] object StaxXmlGenerator {

  def writeRow(
      schema: StructType,
      writer: XMLStreamWriter,
      options: XmlOptions)(row: Row): Unit = {
    writeChildElement(writer, options.rowTag, schema, row, options)
  }

  private def isAttributeField(name: String, options: XmlOptions): Boolean =
    name.startsWith(options.attributePrefix) && name != options.valueTag

  private def writeChildElement(
      writer: XMLStreamWriter,
      name: String,
      dt: DataType,
      value: Any,
      options: XmlOptions): Unit = (dt, value) match {
    case (_, null) | (NullType, _) =>
      if (options.nullValue != null && options.nullValue.nonEmpty) {
        writer.writeStartElement(name)
        writer.writeCharacters(options.nullValue)
        writer.writeEndElement()
      } else {
        writer.writeStartElement(name)
        writer.writeEndElement()
      }
    case (ArrayType(elementType, _), v: scala.collection.Seq[_]) =>
      v.foreach(item => writeChildElement(writer, name, elementType, item, options))
    case _ =>
      writer.writeStartElement(name)
      writeElementBody(writer, dt, value, options)
      writer.writeEndElement()
  }

  private def writeElementBody(
      writer: XMLStreamWriter,
      dt: DataType,
      value: Any,
      options: XmlOptions): Unit = (dt, value) match {
    case (st: StructType, row: Row) =>
      // Attributes must precede any child element.
      val (attrs, elems) = st.fields.zipWithIndex.partition {
        case (f, _) => isAttributeField(f.name, options)
      }
      attrs.foreach { case (f, i) =>
        if (!row.isNullAt(i)) {
          writer.writeAttribute(
            f.name.substring(options.attributePrefix.length),
            scalarText(f.dataType, row.get(i), options))
        }
      }
      elems.foreach { case (f, i) =>
        if (f.name == options.valueTag) {
          if (!row.isNullAt(i)) {
            writer.writeCharacters(scalarText(f.dataType, row.get(i), options))
          }
        } else {
          writeChildElement(writer, f.name, f.dataType, row.get(i), options)
        }
      }
    case (MapType(_, valueType, _), m: scala.collection.Map[_, _]) =>
      m.foreach { case (k, v) =>
        writeChildElement(writer, k.toString, valueType, v, options)
      }
    case (ArrayType(elementType, _), v: scala.collection.Seq[_]) =>
      // Array directly inside an array: wrap items in the configured item tag.
      v.foreach { item =>
        writeChildElement(writer, options.arrayElementName, elementType, item, options)
      }
    case (scalar, v) =>
      writer.writeCharacters(scalarText(scalar, v, options))
  }

  private[xml] def scalarText(dt: DataType, value: Any, options: XmlOptions): String =
    (dt, value) match {
      case (TimestampType, ts: Timestamp) =>
        options.timestampFormat match {
          case Some(fmt) =>
            val zone = options.timezone.map(ZoneId.of).getOrElse(ZoneOffset.UTC)
            DateTimeFormatter.ofPattern(fmt).withZone(zone).format(ts.toInstant)
          case None => isoInstantMicros(ts.toInstant)
        }
      case (TimestampType, i: Instant) =>
        options.timestampFormat match {
          case Some(fmt) =>
            val zone = options.timezone.map(ZoneId.of).getOrElse(ZoneOffset.UTC)
            DateTimeFormatter.ofPattern(fmt).withZone(zone).format(i)
          case None => isoInstantMicros(i)
        }
      case (TimestampNTZType, ldt: java.time.LocalDateTime) =>
        ldt.format(DateTimeFormatter.ISO_LOCAL_DATE_TIME)
      case (DateType, d: Date) =>
        options.dateFormat match {
          case Some(fmt) => d.toLocalDate.format(DateTimeFormatter.ofPattern(fmt))
          case None => d.toLocalDate.format(DateTimeFormatter.ISO_DATE)
        }
      case (DateType, d: LocalDate) =>
        options.dateFormat match {
          case Some(fmt) => d.format(DateTimeFormatter.ofPattern(fmt))
          case None => d.format(DateTimeFormatter.ISO_DATE)
        }
      case (_, v) => v.toString
    }

  /** ISO-8601 instant with full microsecond fidelity (Spark timestamps are µs). */
  private def isoInstantMicros(i: Instant): String =
    DateTimeFormatter.ISO_INSTANT.format(i)
}
