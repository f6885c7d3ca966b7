package graft

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, DataFrameWriter, Dataset, Row, SparkSession}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, StructType}

/**
 * Public column-function and implicit API surface of the graft XML engine
 * (reference: src/main/scala/com/databricks/spark/xml/package.scala:26-157 and
 * functions.scala:35-38).
 *
 * {{{
 *   import graft.xml._
 *   val df  = spark.read.format("graft.xml").option("rowTag", "book").load(path)
 *   val df2 = df.withColumn("decoded", from_xml($"payload", schema))
 * }}}
 */
package object xml {

  /** Parses a string column as XML into `schema`. */
  def from_xml(e: Column, schema: StructType, options: Map[String, String] = Map.empty): Column =
    Bridge.column(XmlDataToCatalyst(Bridge.expression(e), schema, options))

  /** Parses an array-of-strings column; each element becomes a struct. */
  def from_xml_array(
      e: Column,
      schema: ArrayType,
      options: Map[String, String] = Map.empty): Column =
    Bridge.column(XmlDataToCatalyst(Bridge.expression(e), schema, options))

  /** Serializes a struct column to one XML element string (inverse of
   *  `from_xml`; same mapping rules as the file sink). Element name is
   *  `rowTag` (default `ROW`); output is compact unless
   *  `compactOutput=false`. */
  def to_xml(e: Column, options: Map[String, String] = Map.empty): Column =
    Bridge.column(CatalystDataToXml(Bridge.expression(e), options))

  /** Driver-side single-string parse, usable inside UDFs. */
  def from_xml_string(
      xml: String,
      schema: StructType,
      options: Map[String, String] = Map.empty): Row =
    StaxXmlParser.parseColumnExternal(xml, schema, XmlOptions(options))

  /** Infers the schema of a collection of XML document strings. */
  def schema_of_xml(ds: Dataset[String], options: Map[String, String] = Map.empty): StructType = {
    val opts = XmlOptions(options)
    InferSchema.infer(ds.rdd, opts)
  }

  /** Infers from a single-column DataFrame of XML strings. */
  def schema_of_xml_df(df: DataFrame, options: Map[String, String] = Map.empty): StructType =
    schema_of_xml(df.selectExpr("CAST(value AS STRING) AS value")
      .as(org.apache.spark.sql.Encoders.STRING), options)

  /** Array variant: element schema wrapped in ArrayType. */
  def schema_of_xml_array(
      ds: Dataset[String],
      options: Map[String, String] = Map.empty): ArrayType =
    ArrayType(schema_of_xml(ds, options))

  /** `spark.read.xmlng(path)` sugar. */
  implicit class XmlDataFrameReader(reader: DataFrameReader) {
    def xmlng(path: String): DataFrame =
      reader.format("graft.xml").load(path)
  }

  /** `df.write.xmlng(path)` sugar. */
  implicit class XmlDataFrameWriter[T](writer: DataFrameWriter[T]) {
    def xmlng(path: String): Unit =
      writer.format("graft.xml").save(path)
  }

  /** Convenience reader mirroring the reference's `XmlReader` builder. */
  def read(
      spark: SparkSession,
      path: String,
      options: Map[String, String] = Map.empty,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format("graft.xml").options(options)
    schema.fold(r)(s => r.schema(s)).load(path)
  }
}
