package graft.xml

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.types.{ArrayType, StructType}

/**
 * Java-friendly facade over the package-object API: Scala package objects
 * compile to a `package$` class that Java callers can only reach through
 * `MODULE$`, so the column functions are re-exposed here as overloads
 * without default arguments. Scala callers should prefer `graft.xml._`.
 *
 * (Reference behavior: com.databricks.spark.xml.functions and its use from
 * src/test/java/com/databricks/spark/xml/JavaXmlSuite.java.)
 */
object functions {

  /** Parses a string column as XML into `schema`. */
  def from_xml(e: Column, schema: StructType): Column =
    graft.xml.from_xml(e, schema)

  def from_xml(e: Column, schema: StructType, options: java.util.Map[String, String]): Column =
    graft.xml.from_xml(e, schema, options.asScala.toMap)

  /** Parses an array-of-strings column; each element becomes a struct. */
  def from_xml_array(e: Column, schema: ArrayType): Column =
    graft.xml.from_xml_array(e, schema)

  def from_xml_array(e: Column, schema: ArrayType, options: java.util.Map[String, String]): Column =
    graft.xml.from_xml_array(e, schema, options.asScala.toMap)

  /** Serializes a struct column to one XML element string. */
  def to_xml(e: Column): Column =
    graft.xml.to_xml(e)

  def to_xml(e: Column, options: java.util.Map[String, String]): Column =
    graft.xml.to_xml(e, options.asScala.toMap)

  /** Infers the schema of a collection of XML document strings. */
  def schema_of_xml(ds: Dataset[String]): StructType =
    graft.xml.schema_of_xml(ds)

  def schema_of_xml(ds: Dataset[String], options: java.util.Map[String, String]): StructType =
    graft.xml.schema_of_xml(ds, options.asScala.toMap)
}
