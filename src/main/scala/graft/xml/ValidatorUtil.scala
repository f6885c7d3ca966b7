package graft.xml

import java.io.{File, StringReader}
import java.util.concurrent.ConcurrentHashMap

import javax.xml.XMLConstants
import javax.xml.transform.stream.StreamSource
import javax.xml.validation.{Schema, SchemaFactory, Validator}

import org.apache.spark.SparkFiles

/**
 * Per-row XSD validation support (reference:
 * src/main/scala/com/databricks/spark/xml/util/ValidatorUtil.scala:30-55).
 * Compiled [[Schema]] objects are cached per path per JVM (driver and each
 * executor); paths distributed with `SparkContext.addFile` resolve through
 * `SparkFiles`.
 */
private[graft] object ValidatorUtil {

  private val cache = new ConcurrentHashMap[String, Schema]()

  def forPath(path: String): Schema = {
    cache.computeIfAbsent(path, { p =>
      val direct = new File(p)
      val resolved = if (direct.exists()) direct else new File(SparkFiles.get(new File(p).getName))
      val factory = SchemaFactory.newInstance(XMLConstants.W3C_XML_SCHEMA_NS_URI)
      factory.newSchema(new StreamSource(resolved))
    })
  }

  // Validators are not thread-safe, but building one compiles a whole
  // validation pipeline — far more than a record parse. Each task thread
  // reuses one validator per compiled schema (reset() between records);
  // the map is bounded by the number of distinct XSDs in the JVM.
  private val validators = new ThreadLocal[java.util.IdentityHashMap[Schema, Validator]] {
    override def initialValue() = new java.util.IdentityHashMap[Schema, Validator]()
  }

  /** Validates one record; throws on violation (routed through parse modes). */
  def validate(schema: Schema, record: String): Unit = {
    val perThread = validators.get()
    var v = perThread.get(schema)
    if (v == null) {
      v = schema.newValidator()
      perThread.put(schema, v)
    }
    v.reset()
    v.validate(new StreamSource(new StringReader(record)))
  }
}
