package graft.xml

import java.sql.{Date, Timestamp}
import java.time.{Instant, LocalDate, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter

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
 *
 * Emission goes through [[XmlEmitter]], a zero-dependency append-only writer:
 * one reusable StringBuilder per partition instead of a fresh
 * javax.xml.stream writer per row (which dominated write cost).
 */
private[graft] object StaxXmlGenerator {

  def writeRow(
      schema: StructType,
      out: XmlEmitter,
      options: XmlOptions)(row: Row): Unit = {
    writeChildElement(out, options.rowTag, schema, row, options)
  }

  private def isAttributeField(name: String, options: XmlOptions): Boolean =
    name.startsWith(options.attributePrefix) && name != options.valueTag

  private def writeChildElement(
      out: XmlEmitter,
      name: String,
      dt: DataType,
      value: Any,
      options: XmlOptions): Unit = (dt, value) match {
    case (_, null) | (NullType, _) =>
      // With no nullValue representation configured the element is omitted
      // entirely (reference: StaxXmlGenerator.scala:52-56) so a null string
      // round-trips as null, not "".
      if (options.nullValue != null) {
        out.start(name)
        if (options.nullValue.nonEmpty) out.text(options.nullValue)
        out.end(name)
      }
    case (ArrayType(inner: ArrayType, _), v: scala.collection.Seq[_]) =>
      // Array directly inside an array: the inner array has no element name
      // of its own, so each inner array becomes ONE `name` element whose
      // items are wrapped in options.arrayElementName (the body's
      // array-in-array case). Flattening both levels under `name` would
      // lose the nesting on read-back (reference: StaxXmlGenerator.scala:
      // 74-77, XmlSuite "DSL save with item").
      v.foreach {
        case null => writeChildElement(out, name, NullType, null, options)
        case item =>
          out.start(name)
          writeElementBody(out, inner, item, options)
          out.end(name)
      }
    case (ArrayType(elementType, _), v: scala.collection.Seq[_]) =>
      v.foreach(item => writeChildElement(out, name, elementType, item, options))
    case _ =>
      out.start(name)
      writeElementBody(out, dt, value, options)
      out.end(name)
  }

  private def writeElementBody(
      out: XmlEmitter,
      dt: DataType,
      value: Any,
      options: XmlOptions): Unit = (dt, value) match {
    case (st: StructType, row: Row) =>
      // Attributes must precede any child element.
      var i = 0
      while (i < st.length) {
        val f = st.fields(i)
        if (isAttributeField(f.name, options) && !row.isNullAt(i)) {
          out.attr(f.name.substring(options.attributePrefix.length),
            scalarText(f.dataType, row.get(i), options))
        }
        i += 1
      }
      i = 0
      while (i < st.length) {
        val f = st.fields(i)
        if (!isAttributeField(f.name, options)) {
          if (f.name == options.valueTag) {
            if (!row.isNullAt(i)) out.text(scalarText(f.dataType, row.get(i), options))
          } else {
            writeChildElement(out, f.name, f.dataType, row.get(i), options)
          }
        }
        i += 1
      }
    case (MapType(_, valueType, _), m: scala.collection.Map[_, _]) =>
      // Keys carrying the attribute prefix become attributes (reference:
      // StaxXmlGenerator.scala:115-123); attributes must precede children.
      m.foreach { case (k, v) =>
        val key = k.toString
        if (isAttributeField(key, options) && v != null) {
          out.attr(key.substring(options.attributePrefix.length),
            scalarText(valueType, v, options))
        }
      }
      m.foreach { case (k, v) =>
        val key = k.toString
        if (!isAttributeField(key, options)) {
          writeChildElement(out, key, valueType, v, options)
        }
      }
    case (ArrayType(elementType, _), v: scala.collection.Seq[_]) =>
      // Array directly inside an array: wrap items in the configured item
      // tag. An item that is ITSELF an array must become ONE wrapped element
      // carrying its own array body — delegating to writeChildElement's
      // repeat-per-name convention would flatten the grouping at depth >= 3
      // ([[1,2],[3]] and [[1],[2,3]] would serialize identically).
      v.foreach {
        case null =>
          writeChildElement(out, options.arrayElementName, NullType, null, options)
        case item =>
          elementType match {
            case innerArr: ArrayType =>
              out.start(options.arrayElementName)
              writeElementBody(out, innerArr, item, options)
              out.end(options.arrayElementName)
            case _ =>
              writeChildElement(out, options.arrayElementName, elementType, item, options)
          }
      }
    case (scalar, v) =>
      out.text(scalarText(scalar, v, options))
  }

  private[xml] def scalarText(dt: DataType, value: Any, options: XmlOptions): String =
    (dt, value) match {
      case (TimestampType, ts: Timestamp) =>
        options.timestampFormat match {
          case Some(fmt) =>
            val zone = options.timezone.map(ZoneId.of).getOrElse(ZoneOffset.UTC)
            DateTimeFormatter.ofPattern(fmt).withZone(zone).format(ts.toInstant)
          case None => DateTimeFormatter.ISO_INSTANT.format(ts.toInstant)
        }
      case (TimestampType, i: Instant) =>
        options.timestampFormat match {
          case Some(fmt) =>
            val zone = options.timezone.map(ZoneId.of).getOrElse(ZoneOffset.UTC)
            DateTimeFormatter.ofPattern(fmt).withZone(zone).format(i)
          case None => DateTimeFormatter.ISO_INSTANT.format(i)
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
}

/**
 * Minimal streaming XML emitter over a StringBuilder: start/attr/text/end
 * with XML 1.0 escaping and pretty-printing. Not a general-purpose writer —
 * exactly the surface the generator needs, with zero per-row allocation
 * beyond the builder growth.
 */
private[graft] final class XmlEmitter(
    sb: java.lang.StringBuilder,
    baseDepth: Int,
    compact: Boolean = false) {
  private var depth = baseDepth
  private var openTag = false // start tag written but '>' pending
  private var hadChild: List[Boolean] = Nil

  def start(name: String): Unit = {
    if (openTag) { sb.append('>'); openTag = false }
    hadChild = hadChild match {
      case _ :: tail => true :: tail
      case Nil => Nil
    }
    if (!compact) {
      sb.append('\n')
      var i = 0
      while (i < depth * 4) { sb.append(' '); i += 1 }
    }
    sb.append('<').append(name)
    openTag = true
    depth += 1
    hadChild = false :: hadChild
  }

  def attr(name: String, value: String): Unit = {
    sb.append(' ').append(name).append("=\"")
    escapeInto(value, attrMode = true)
    sb.append('"')
  }

  def text(value: String): Unit = {
    if (openTag) { sb.append('>'); openTag = false }
    escapeInto(value, attrMode = false)
  }

  def end(name: String): Unit = {
    depth -= 1
    val children = hadChild.headOption.getOrElse(false)
    hadChild = hadChild.drop(1)
    if (openTag) {
      sb.append("/>")
      openTag = false
    } else {
      if (children && !compact) {
        sb.append('\n')
        var i = 0
        while (i < depth * 4) { sb.append(' '); i += 1 }
      }
      sb.append("</").append(name).append('>')
    }
  }

  private def escapeInto(s: String, attrMode: Boolean): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' if attrMode => sb.append("&quot;")
        case _ => sb.append(c)
      }
      i += 1
    }
  }
}
