package graft.xml

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expression behind `to_xml`: serializes a struct column to one XML
 * element string — the inverse of [[XmlDataToCatalyst]] (`from_xml`).
 *
 * The reference library has no `to_xml` (its only write surface is the file
 * sink), but Spark 4's built-in XML source ships one, so a reference user
 * migrating through this library gets the full modern column surface:
 * `from_xml(to_xml(s)) == s` for any struct `s` under the same options.
 *
 * Serialization reuses the file sink's generator ([[StaxXmlGenerator]] /
 * [[XmlEmitter]]) so every mapping rule — attributes via `attributePrefix`
 * written before children, `valueTag` character data, arrays repeating the
 * element, nulls omitted unless `nullValue` is set, timestamp/date formats —
 * is byte-identical between `df.write.xmlng` and `to_xml`. Output defaults
 * to compact (one line, no indentation), the useful shape for a string
 * column; pass `compactOutput=false` for the pretty form.
 *
 * `CodegenFallback` matches `from_xml`: string assembly dominates, so
 * interpreted eval inside a generated stage loses nothing measurable. The
 * builder is reused across rows (one per task-deserialized expression
 * instance, single-threaded within a task).
 */
case class CatalystDataToXml(
    child: Expression,
    options: Map[String, String])
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val xmlOptions = XmlOptions(
    if (options.contains("compactOutput")) options
    else options + ("compactOutput" -> "true"))

  @transient private lazy val rowSchema: StructType =
    child.dataType.asInstanceOf[StructType]

  @transient private lazy val generator = new StaxXmlGenerator(rowSchema, xmlOptions)

  @transient private lazy val sb = new java.lang.StringBuilder(1 << 10)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_xml requires a struct column, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    sb.setLength(0)
    val emitter = new XmlEmitter(sb, baseDepth = 0, compact = xmlOptions.compactOutput)
    generator.write(emitter, input.asInstanceOf[InternalRow])
    // Pretty mode opens with the emitter's leading newline; a scalar string
    // value starts at '<'.
    val start = if (sb.length > 0 && sb.charAt(0) == '\n') 1 else 0
    UTF8String.fromString(sb.substring(start))
  }

  override def prettyName: String = "to_xml"

  override protected def withNewChildInternal(newChild: Expression): CatalystDataToXml =
    copy(child = newChild)
}
