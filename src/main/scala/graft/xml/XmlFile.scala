package graft.xml

import java.io.StringWriter
import java.nio.charset.Charset

import javax.xml.stream.{XMLOutputFactory, XMLStreamWriter}

import org.apache.hadoop.io.{LongWritable, Text}
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

  /** Raw record strings for `path`, split-parallel. */
  def read(sc: SparkContext, path: String, options: XmlOptions): RDD[String] = {
    val conf = new org.apache.hadoop.conf.Configuration(sc.hadoopConfiguration)
    conf.set(XmlInputFormat.ROW_TAG_KEY, options.rowTag)
    conf.set(XmlInputFormat.ENCODING_KEY, options.charset)
    val charsetName = options.charset
    sc.newAPIHadoopFile(
        path,
        classOf[XmlInputFormat],
        classOf[LongWritable],
        classOf[Text],
        conf)
      .mapPartitions { iter =>
        val charset = Charset.forName(charsetName)
        iter.map { case (_, text) => new String(text.getBytes, 0, text.getLength, charset) }
      }
  }

  def save(df: DataFrame, path: String, options: XmlOptions): Unit = {
    val schema = df.schema
    val codecClass: Option[Class[_ <: CompressionCodec]] = options.codec.map { name =>
      resolveCodec(name)
    }
    val rendered = df.rdd.mapPartitions { rows =>
      new Iterator[String] {
        private var begun = false
        private var ended = false
        override def hasNext: Boolean = !ended
        override def next(): String = {
          if (!begun) {
            begun = true
            val header = new StringBuilder
            if (options.declaration.nonEmpty) {
              header ++= s"<?xml ${options.declaration}?>\n"
            }
            header ++= s"<${options.rootTag}>"
            if (!rows.hasNext) { ended = true; header ++= s"\n</${options.rootTag}>" }
            header.result()
          } else if (rows.hasNext) {
            val sw = new StringWriter
            val writer = XmlOutputFactories.get.createXMLStreamWriter(sw)
            val indenting = new IndentingStreamWriter(writer, baseDepth = 1)
            StaxXmlGenerator.writeRow(schema, indenting, options)(rows.next())
            writer.flush()
            val body = sw.toString
            if (!rows.hasNext) {
              ended = true
              body + s"\n</${options.rootTag}>"
            } else body
          } else {
            throw new NoSuchElementException("exhausted")
          }
        }
      }
    }
    codecClass match {
      case Some(c) => rendered.saveAsTextFile(path, c)
      case None => rendered.saveAsTextFile(path)
    }
  }

  private def resolveCodec(name: String): Class[_ <: CompressionCodec] = {
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

/** Thread-local StAX output factories. */
private[xml] object XmlOutputFactories {
  private val tl = new ThreadLocal[XMLOutputFactory] {
    override def initialValue(): XMLOutputFactory = XMLOutputFactory.newInstance()
  }
  def get: XMLOutputFactory = tl.get()
}

/**
 * Minimal indenting decorator over an [[XMLStreamWriter]] (the JDK ships no
 * indenting writer). Newline + 4-space indent before every start element;
 * closing tags of element-containing nodes get their own line.
 */
private[xml] final class IndentingStreamWriter(delegate: XMLStreamWriter, baseDepth: Int)
    extends XMLStreamWriter {
  private var depth = baseDepth
  private var hadChildElement = List[Boolean]()

  private def indent(): Unit = {
    delegate.writeCharacters("\n" + ("    " * depth))
  }

  override def writeStartElement(localName: String): Unit = {
    hadChildElement = hadChildElement match {
      case _ :: tail => true :: tail
      case Nil => Nil
    }
    indent()
    depth += 1
    hadChildElement = false :: hadChildElement
    delegate.writeStartElement(localName)
  }

  override def writeEndElement(): Unit = {
    depth -= 1
    val hadChildren = hadChildElement.headOption.getOrElse(false)
    hadChildElement = hadChildElement.drop(1)
    if (hadChildren) indent()
    delegate.writeEndElement()
  }

  override def writeEmptyElement(localName: String): Unit = {
    hadChildElement = hadChildElement match {
      case _ :: tail => true :: tail
      case Nil => Nil
    }
    indent()
    delegate.writeEmptyElement(localName)
  }

  // Pass-through members.
  override def writeStartElement(namespaceURI: String, localName: String): Unit =
    writeStartElement(localName)
  override def writeStartElement(prefix: String, localName: String, namespaceURI: String): Unit =
    writeStartElement(localName)
  override def writeEmptyElement(namespaceURI: String, localName: String): Unit =
    writeEmptyElement(localName)
  override def writeEmptyElement(prefix: String, localName: String, namespaceURI: String): Unit =
    writeEmptyElement(localName)
  override def writeEndDocument(): Unit = delegate.writeEndDocument()
  override def close(): Unit = delegate.close()
  override def flush(): Unit = delegate.flush()
  override def writeAttribute(localName: String, value: String): Unit =
    delegate.writeAttribute(localName, value)
  override def writeAttribute(
      prefix: String, namespaceURI: String, localName: String, value: String): Unit =
    delegate.writeAttribute(localName, value)
  override def writeAttribute(namespaceURI: String, localName: String, value: String): Unit =
    delegate.writeAttribute(localName, value)
  override def writeNamespace(prefix: String, namespaceURI: String): Unit = ()
  override def writeDefaultNamespace(namespaceURI: String): Unit = ()
  override def writeComment(data: String): Unit = delegate.writeComment(data)
  override def writeProcessingInstruction(target: String): Unit =
    delegate.writeProcessingInstruction(target)
  override def writeProcessingInstruction(target: String, data: String): Unit =
    delegate.writeProcessingInstruction(target, data)
  override def writeCData(data: String): Unit = delegate.writeCData(data)
  override def writeDTD(dtd: String): Unit = delegate.writeDTD(dtd)
  override def writeEntityRef(name: String): Unit = delegate.writeEntityRef(name)
  override def writeStartDocument(): Unit = delegate.writeStartDocument()
  override def writeStartDocument(version: String): Unit = delegate.writeStartDocument(version)
  override def writeStartDocument(encoding: String, version: String): Unit =
    delegate.writeStartDocument(encoding, version)
  override def writeCharacters(text: String): Unit = delegate.writeCharacters(text)
  override def writeCharacters(text: Array[Char], start: Int, len: Int): Unit =
    delegate.writeCharacters(text, start, len)
  override def getPrefix(uri: String): String = delegate.getPrefix(uri)
  override def setPrefix(prefix: String, uri: String): Unit = ()
  override def setDefaultNamespace(uri: String): Unit = ()
  override def setNamespaceContext(context: javax.xml.namespace.NamespaceContext): Unit = ()
  override def getNamespaceContext: javax.xml.namespace.NamespaceContext =
    delegate.getNamespaceContext
  override def getProperty(name: String): AnyRef = delegate.getProperty(name)
}
