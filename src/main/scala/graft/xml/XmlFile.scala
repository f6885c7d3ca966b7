package graft.xml

import java.nio.charset.Charset

import org.apache.hadoop.io.{LongWritable, NullWritable, Text}
import org.apache.hadoop.io.compress.CompressionCodec
import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame


/**
 * File-level entry points: records-RDD extraction for the read path and
 * partition-wise XML serialization for the write path (reference:
 * src/main/scala/com/databricks/spark/xml/util/XmlFile.scala:39-161).
 *
 * Write layout: each task writes one part file that is a complete XML
 * document (`declaration`, `<rootTag>`, one `<rowTag>` element per row,
 * `</rootTag>`), so part files are independently parseable — the property
 * that makes a 100 TB corpus embarrassingly parallel to re-read.
 */
private[graft] object XmlFile {

  /**
   * Split max-size per Spark's FilePartition.maxSplitBytes policy: pack the
   * input into at least defaultParallelism splits, bounded by [4 MB
   * open-cost, 128 MB]. FileInputFormat otherwise splits at the filesystem
   * block size (32 MB on local disks), which leaves most cores idle on
   * inputs in the 100 MB range. Involves a driver-side listing — compute
   * once per relation and pass the result to [[read]] (XmlRelation caches
   * it across inference + every buildScan); None when the listing fails or
   * an explicit user setting should win.
   */
  def splitMaxSizeFor(sc: SparkContext, path: String): Option[Long] = {
    if (sc.hadoopConfiguration.get("mapreduce.input.fileinputformat.split.maxsize") != null) {
      return None
    }
    totalInputBytes(sc.hadoopConfiguration, path).map { total =>
      val target = math.max(1, sc.defaultParallelism)
      math.min(128L << 20, math.max(4L << 20, total / target))
    }
  }

  /** Raw record strings for `path`, split-parallel; computes split sizing
   *  here (explicit `splitMaxBytes` option, else the packing policy). */
  def read(sc: SparkContext, path: String, options: XmlOptions): RDD[String] =
    read(sc, path, options, options.splitMaxBytes.orElse(splitMaxSizeFor(sc, path)))

  /** Raw record strings for `path`, split-parallel, with sizing precomputed
   *  by the caller (XmlRelation computes once and reuses across inference +
   *  every buildScan). */
  def read(
      sc: SparkContext,
      path: String,
      options: XmlOptions,
      splitMaxSize: Option[Long]): RDD[String] = {
    val conf = new org.apache.hadoop.conf.Configuration(sc.hadoopConfiguration)
    conf.set(XmlInputFormat.ROW_TAG_KEY, options.rowTag)
    conf.set(XmlInputFormat.ENCODING_KEY, options.charset)
    splitMaxSize.foreach { maxSplit =>
      // An explicit per-read option wins over the global Hadoop conf (this
      // conf is a private copy); policy-computed sizing only fills a gap.
      if (options.splitMaxBytes.isDefined ||
          conf.get("mapreduce.input.fileinputformat.split.maxsize") == null) {
        conf.setLong("mapreduce.input.fileinputformat.split.maxsize", maxSplit)
      }
    }
    val charsetName = options.charset
    sc.newAPIHadoopFile(
        path,
        classOf[XmlInputFormat],
        classOf[LongWritable],
        classOf[Text],
        conf)
      .mapPartitions { iter =>
        // Non-ASCII-compatible input was decoded to UTF-8 by the record
        // reader (TranscodingInputStream), so record bytes are then UTF-8
        // regardless of the file charset.
        val cs = Charset.forName(charsetName)
        val charset =
          if (XmlInputFormat.isAsciiCompatible(cs)) cs
          else java.nio.charset.StandardCharsets.UTF_8
        iter.map { case (_, text) => new String(text.getBytes, 0, text.getLength, charset) }
      }
  }

  /** Total byte size of the files `path` names (comma-separated, globs ok);
   *  None if listing fails — sizing then falls back to Hadoop defaults. */
  private def totalInputBytes(
      conf: org.apache.hadoop.conf.Configuration,
      path: String): Option[Long] = {
    try {
      var total = 0L
      path.split(",").foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p.trim)
        val fs = hp.getFileSystem(conf)
        val matches = fs.globStatus(hp)
        if (matches != null) matches.foreach { st =>
          total += (if (st.isDirectory) fs.getContentSummary(st.getPath).getLength
                    else st.getLen)
        }
      }
      Some(total)
    } catch { case _: Exception => None }
  }

  def save(df: DataFrame, path: String, options: XmlOptions): Unit = {
    val schema = df.schema
    // rootTag may carry inline attributes ("books count=\"3\""); only the
    // name part closes the document (reference: XmlFile.scala:88-101).
    val rootTagName = options.rootTag.split(" ", 2)(0)
    val codecClass: Option[Class[_ <: CompressionCodec]] = options.codec.map { name =>
      resolveCodec(name)
    }
    // Serialize from InternalRow directly: the external `df.rdd` conversion
    // (boxing every numeric, decoding every string) dominated write cost.
    // The sink mirrors saveAsTextFile (same old-API TextOutputFormat, same
    // NullWritable-key value-plus-newline layout, same reused Text) but
    // fills the Text bytes straight from the builder — all-ASCII rows (the
    // common case for XML) never materialize a per-row String, rows with
    // non-ASCII text fall back to the JDK encoder for exact parity.
    val rendered = df.queryExecution.toRdd.mapPartitions { rows =>
      // One reusable builder + Text per partition; each next() yields one
      // text line block (header, row, or row+footer).
      val sb = new java.lang.StringBuilder(1 << 16)
      val gen = new StaxXmlGenerator(schema, options)
      val text = new Text()
      var buf = new Array[Byte](1 << 16)
      // Fill `text` with the UTF-8 encoding of sb[from..sb.length).
      def fillText(from: Int): Unit = {
        val len = sb.length
        if (buf.length < len - from) {
          buf = new Array[Byte](Integer.highestOneBit(len - from) << 1)
        }
        var i = from
        var bi = 0
        var ascii = true
        while (ascii && i < len) {
          val c = sb.charAt(i)
          if (c < 0x80) { buf(bi) = c.toByte; bi += 1; i += 1 }
          else ascii = false
        }
        if (ascii) text.set(buf, 0, bi)
        else text.set(sb.substring(from)) // JDK-exact encode for non-ASCII
      }
      new Iterator[(NullWritable, Text)] {
        private var begun = false
        private var ended = false
        override def hasNext: Boolean = !ended
        override def next(): (NullWritable, Text) = {
          if (!begun) {
            begun = true
            val header = new StringBuilder
            if (options.declaration.nonEmpty) {
              header ++= s"<?xml ${options.declaration}?>\n"
            }
            header ++= s"<${options.rootTag}>"
            if (!rows.hasNext) { ended = true; header ++= s"\n</$rootTagName>" }
            text.set(header.result())
          } else if (rows.hasNext) {
            sb.setLength(0)
            val emitter = new XmlEmitter(sb, baseDepth = 1, compact = options.compactOutput)
            gen.write(emitter, rows.next())
            if (!rows.hasNext) {
              ended = true
              sb.append('\n').append("</").append(rootTagName).append('>')
            }
            // Pretty mode: strip the emitter's leading newline — the sink
            // writes one per record. Compact rows start at '<'.
            fillText(if (options.compactOutput) 0 else 1)
          } else {
            throw new NoSuchElementException("exhausted")
          }
          (NullWritable.get(), text)
        }
      }
    }
    val outFmt = classOf[org.apache.hadoop.mapred.TextOutputFormat[NullWritable, Text]]
    codecClass match {
      case Some(c) =>
        rendered.saveAsHadoopFile(path, classOf[NullWritable], classOf[Text], outFmt, c)
      case None =>
        rendered.saveAsHadoopFile(path, classOf[NullWritable], classOf[Text], outFmt)
    }
  }

  /** Shared with the V2 write path (same option, same short names). */
  private[graft] def resolveCodec(name: String): Class[_ <: CompressionCodec] = {
    val shortNames = Map(
      "gzip" -> "org.apache.hadoop.io.compress.GzipCodec",
      "bzip2" -> "org.apache.hadoop.io.compress.BZip2Codec",
      "deflate" -> "org.apache.hadoop.io.compress.DeflateCodec",
      "snappy" -> "org.apache.hadoop.io.compress.SnappyCodec",
      "lz4" -> "org.apache.hadoop.io.compress.Lz4Codec")
    val className = shortNames.getOrElse(name.toLowerCase, name)
    Class.forName(className, true, Thread.currentThread.getContextClassLoader)
      .asInstanceOf[Class[_ <: CompressionCodec]]
  }
}
