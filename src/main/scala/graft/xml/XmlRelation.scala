package graft.xml

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/**
 * The XML-backed relational table: a directory/glob of XML files plus a
 * `rowTag` (reference: src/main/scala/com/databricks/spark/xml/XmlRelation.scala:29-84).
 *
 * `PrunedScan` pushes the projection into the scan: the parser receives a
 * sub-schema and skips every subtree it doesn't mention, so a 2-column
 * projection over a 100-column document never materializes the other 98.
 * All other relational work (filters, joins, aggregates, windows, …) is
 * planned by Catalyst above this scan.
 */
case class XmlRelation(
    location: String,
    parameters: Map[String, String],
    userSchema: Option[StructType])(@transient val sqlContext: SQLContext)
  extends BaseRelation with PrunedScan with InsertableRelation {

  private val options = XmlOptions(parameters)

  private def baseRDD(): RDD[String] =
    XmlFile.read(sqlContext.sparkContext, location, options)

  override val schema: StructType = userSchema.getOrElse {
    val inferred = InferSchema.infer(baseRDD(), options)
    if (options.inferSchema) inferred
    else InferSchema.stringOnly(inferred).asInstanceOf[StructType]
  }

  // The parser emits InternalRow directly; telling Spark so skips the
  // per-row external->internal conversion above the scan.
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String]): RDD[Row] = {
    val requested =
      if (requiredColumns.isEmpty) schema
      else StructType(requiredColumns.flatMap(c => schema.fields.find(_.name == c)))
    // Malformedness is defined against the full row: a pruned parse would
    // never attempt the casts of unselected columns, silently changing what
    // counts as corrupt. When the query observes malformedness — it selects
    // the corrupt-record column, or the mode drops bad rows — parse the full
    // schema and project afterwards.
    val observesMalformed =
      requiredColumns.contains(options.columnNameOfCorruptRecord) ||
        options.parseMode == ParseMode.DropMalformed
    if (!observesMalformed || requested.length == schema.length) {
      StaxXmlParser.parse(baseRDD(), requested, options).asInstanceOf[RDD[Row]]
    } else {
      val full = schema
      val idxs = requested.fieldNames.map(full.fieldIndex)
      val types = idxs.map(i => full(i).dataType)
      StaxXmlParser.parse(baseRDD(), full, options)
        .map { row =>
          val values = new Array[Any](idxs.length)
          var i = 0
          while (i < idxs.length) { values(i) = row.get(idxs(i), types(i)); i += 1 }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values):
            org.apache.spark.sql.catalyst.InternalRow
        }.asInstanceOf[RDD[Row]]
    }
  }

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    val path = new Path(location)
    val fs = path.getFileSystem(sqlContext.sparkContext.hadoopConfiguration)
    if (overwrite) {
      if (fs.exists(path)) fs.delete(path, true)
      XmlFile.save(data, location, options)
    } else {
      throw new UnsupportedOperationException(
        "APPEND is not supported for the graft XML source; use Overwrite")
    }
  }
}

/**
 * DSv1 registration: `spark.read.format("graft.xml").…` or the short name
 * `xmlng` (distinct from Spark 4's built-in `xml` source)
 * (reference: src/main/scala/com/databricks/spark/xml/DefaultSource.scala:29-111).
 */
class DefaultSource
  extends RelationProvider
  with SchemaRelationProvider
  with CreatableRelationProvider
  with DataSourceRegister {

  override def shortName(): String = "xmlng"

  private def pathFor(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' must be specified for XML data"))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    createRelation(sqlContext, parameters, null)

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation = {
    val withTz =
      if (parameters.contains("timezone")) parameters
      else parameters + ("timezone" -> sqlContext.sparkSession.sessionState.conf.sessionLocalTimeZone)
    XmlRelation(pathFor(parameters), withTz, Option(schema))(sqlContext)
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val location = pathFor(parameters)
    val options = XmlOptions(parameters)
    val path = new Path(location)
    val fs = path.getFileSystem(sqlContext.sparkContext.hadoopConfiguration)
    val exists = fs.exists(path)
    val doSave = mode match {
      case SaveMode.Overwrite =>
        if (exists) fs.delete(path, true)
        true
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"path $location already exists")
      case SaveMode.Ignore if exists => false
      case SaveMode.Append =>
        throw new UnsupportedOperationException(
          "Append mode is not supported by the graft XML source")
      case _ => true
    }
    if (doSave) XmlFile.save(data, location, options)
    createRelation(sqlContext, parameters, data.schema)
  }
}
