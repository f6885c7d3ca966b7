package graft.xml

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/**
 * Compiles pushed-down [[Filter]]s into a conjunction of required-substring
 * groups over the RAW record text: a record that contains no member of some
 * group cannot produce a matching row, so the whole StAX parse is skipped.
 * Strictly a necessary-condition pre-test — every filter is also declared
 * unhandled, so Spark re-evaluates all of them above the scan and a false
 * KEEP costs only the parse it would have cost anyway.
 *
 * Only predicates whose match implies a verbatim substring are compiled:
 * equality / contains / prefix / suffix / IN on top-level string fields,
 * with values made only of printable ASCII that XML never escapes. Values a
 * writer could legally encode differently (the five specials, non-ASCII)
 * are left out, so the pre-test never false-drops for standard-escaping
 * writers; `rawFilterPushdown=false` opts out entirely for documents using
 * numeric character references on ordinary ASCII.
 *
 * (The reference declines filter pushdown — XmlRelation.scala:34-36; this
 * is a deliberate improvement for scan-heavy selective queries.)
 */
private[xml] object RawRecordFilter {

  private def substringSafe(v: String): Boolean =
    v != null && v.nonEmpty &&
      v.forall(c => c >= 0x20 && c < 0x7f &&
        c != '&' && c != '<' && c != '>' && c != '"' && c != '\'')

  /** Conjunction of disjunction-groups; empty = no usable pre-filter. */
  def compile(filters: Array[Filter], schema: StructType, options: XmlOptions): Array[Array[String]] = {
    def stringField(name: String): Boolean =
      name != options.columnNameOfCorruptRecord &&
        schema.fields.exists(f => f.name == name && f.dataType == StringType)

    def groups(f: Filter): Option[Seq[Seq[String]]] = f match {
      case EqualTo(a, v: String) if stringField(a) && substringSafe(v) =>
        Some(Seq(Seq(v)))
      case StringContains(a, v) if stringField(a) && substringSafe(v) =>
        Some(Seq(Seq(v)))
      case StringStartsWith(a, v) if stringField(a) && substringSafe(v) =>
        Some(Seq(Seq(v)))
      case StringEndsWith(a, v) if stringField(a) && substringSafe(v) =>
        Some(Seq(Seq(v)))
      case In(a, vs) if stringField(a) && vs.nonEmpty &&
          vs.forall(v => v.isInstanceOf[String] && substringSafe(v.asInstanceOf[String])) =>
        Some(Seq(vs.map(_.asInstanceOf[String]).toSeq))
      case And(l, r) =>
        // Both sides must hold, so either side's requirements stand alone.
        (groups(l), groups(r)) match {
          case (Some(a), Some(b)) => Some(a ++ b)
          case (a @ Some(_), None) => a
          case (None, b) => b
        }
      case Or(l, r) =>
        // Only mergeable when each side is a single group; a lost side would
        // wrongly strengthen the condition.
        for {
          a <- groups(l) if a.lengthCompare(1) == 0
          b <- groups(r) if b.lengthCompare(1) == 0
        } yield Seq(a.head ++ b.head)
      case _ => None
    }

    filters.iterator.flatMap(f => groups(f).getOrElse(Nil))
      .map(_.toArray).toArray
  }
}

/**
 * The XML-backed relational table: a directory/glob of XML files plus a
 * `rowTag` (reference: src/main/scala/com/databricks/spark/xml/XmlRelation.scala:29-84).
 *
 * `PrunedFilteredScan` pushes projection and filters into the scan: the
 * parser receives a sub-schema and skips every subtree it doesn't mention,
 * so a 2-column projection over a 100-column document never materializes
 * the other 98; pushed string predicates become a raw-substring pre-test
 * ([[RawRecordFilter]]) that skips the StAX parse of records that cannot
 * match. All other relational work (joins, aggregates, windows, …) is
 * planned by Catalyst above this scan.
 */
case class XmlRelation(
    location: String,
    parameters: Map[String, String],
    userSchema: Option[StructType])(@transient val sqlContext: SQLContext)
  extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private val options = XmlOptions(parameters)

  // One driver-side listing per relation, shared by inference and every
  // buildScan (each would otherwise re-list the input to size splits). An
  // explicit splitMaxBytes option skips the listing entirely.
  @transient private lazy val splitMaxSize: Option[Long] =
    options.splitMaxBytes.orElse(
      XmlFile.splitMaxSizeFor(sqlContext.sparkContext, location))

  private def baseRDD(): RDD[String] =
    XmlFile.read(sqlContext.sparkContext, location, options, splitMaxSize)

  override val schema: StructType = userSchema.getOrElse {
    val inferred = InferSchema.infer(baseRDD(), options)
    if (options.inferSchema) inferred
    else InferSchema.stringOnly(inferred).asInstanceOf[StructType]
  }

  // The parser emits InternalRow directly; telling Spark so skips the
  // per-row external->internal conversion above the scan.
  override def needConversion: Boolean = false

  // The raw pre-test is a necessary condition only; Spark must re-evaluate
  // every filter above the scan.
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val requested =
      if (requiredColumns.isEmpty) schema
      else StructType(requiredColumns.flatMap(c => schema.fields.find(_.name == c)))
    // FAILFAST must see every record: a pre-dropped malformed record would
    // let a query succeed that is contractually required to throw.
    val preGroups =
      if (options.rawFilterPushdown && options.parseMode != ParseMode.FailFast) {
        RawRecordFilter.compile(filters, schema, options)
      } else Array.empty[Array[String]]
    def rawRecords(): RDD[String] = {
      val raw = baseRDD()
      if (preGroups.isEmpty) raw
      else raw.filter(rec => preGroups.forall(g => g.exists(rec.contains)))
    }
    // Malformedness is defined against the full row: a pruned parse would
    // never attempt the casts of unselected columns, silently changing what
    // counts as corrupt. When the query observes malformedness — it selects
    // the corrupt-record column, or the mode drops bad rows — parse the full
    // schema and project afterwards.
    val observesMalformed =
      requiredColumns.contains(options.columnNameOfCorruptRecord) ||
        options.parseMode == ParseMode.DropMalformed
    if (!observesMalformed || requested.length == schema.length) {
      StaxXmlParser.parse(rawRecords(), requested, options).asInstanceOf[RDD[Row]]
    } else {
      val full = schema
      val idxs = requested.fieldNames.map(full.fieldIndex)
      val types = idxs.map(i => full(i).dataType)
      StaxXmlParser.parse(rawRecords(), full, options)
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
  with StreamSourceProvider
  with StreamSinkProvider
  with DataSourceRegister {

  override def shortName(): String = "xmlng"

  private def pathFor(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' must be specified for XML data"))

  // ---- Structured Streaming: readStream.format("xmlng") ----

  private def inferStreamSchema(
      sqlContext: SQLContext,
      parameters: Map[String, String]): StructType = {
    val options = XmlOptions(parameters)
    val raw = XmlFile.read(sqlContext.sparkContext, pathFor(parameters), options)
    if (raw.isEmpty()) {
      throw new IllegalArgumentException(
        "Cannot infer a schema for an XML stream over an empty directory; " +
          "provide .schema(...) or seed the directory first")
    }
    val inferred = InferSchema.infer(raw, options)
    if (options.inferSchema) inferred
    else InferSchema.stringOnly(inferred).asInstanceOf[StructType]
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val resolved = schema.getOrElse {
      // Infer once per QUERY START from the files already present — the
      // stream's schema is fixed for its lifetime, like other file sources.
      // Spark calls sourceSchema at plan time and createSource at start
      // with only the USER schema, so without a handoff inference would
      // scan the directory twice — and could resolve two different schemas
      // if files landed in between, failing the first micro-batch's
      // plan/output check. The pin holds (path, options) → planned schema
      // until createSource CONSUMES it, so the next query over the same
      // path re-infers fresh (new fields are picked up) and the map stays
      // bounded. Inference runs outside the map — a multi-second Spark job
      // must not execute under a ConcurrentHashMap bin lock.
      val key = (pathFor(parameters), parameters.toSeq.sorted)
      Option(DefaultSource.plannedStreamSchemas.get(key)).getOrElse {
        val inferred = inferStreamSchema(sqlContext, parameters)
        val prior = DefaultSource.plannedStreamSchemas.putIfAbsent(key, inferred)
        if (prior != null) prior else inferred
      }
    }
    (shortName(), resolved)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val resolved = schema.getOrElse {
      // Consume the schema pinned at plan time (guaranteeing the source
      // matches the analyzed plan's attributes); if none is pinned —
      // checkpoint restart paths that skip sourceSchema — infer here.
      val key = (pathFor(parameters), parameters.toSeq.sorted)
      Option(DefaultSource.plannedStreamSchemas.remove(key))
        .getOrElse(inferStreamSchema(sqlContext, parameters))
    }
    new XmlStreamSource(sqlContext, metadataPath, pathFor(parameters), resolved, parameters)
  }

  // ---- Structured Streaming: writeStream.format("xmlng") ----

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"xmlng sink supports Append output mode only, got $outputMode " +
        "(files are immutable once written; aggregate with a watermark to use Append)")
    require(partitionColumns.isEmpty,
      "xmlng sink does not support partitionBy; partition upstream or write separate streams")
    new XmlStreamSink(sqlContext, pathFor(parameters), parameters)
  }

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

object DefaultSource {
  /** Plan-time → start-time schema handoff: (path, sorted options) ->
   *  schema inferred at sourceSchema, consumed (removed) by createSource.
   *  Driver-side; bounded because every entry is consumed at query start. */
  private[xml] val plannedStreamSchemas =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Seq[(String, String)]),
      org.apache.spark.sql.types.StructType]()
}
