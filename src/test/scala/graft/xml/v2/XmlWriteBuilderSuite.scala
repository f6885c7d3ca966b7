package graft.xml.v2

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.sources.{AlwaysTrue, EqualTo, Filter}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-time contract of the V2 overwrite surface: always-true maps to
  * truncate-at-commit, anything selective is rejected loudly — an
  * unpartitioned XML directory has no metadata to prune files by, and a
  * silent degrade to full truncation would destroy unmatched rows. */
class XmlWriteBuilderSuite extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("id", LongType)))
  private def builder() = new XmlWriteBuilder(
    Map("path" -> "/tmp/graft_v2_builder_spec", "rowTag" -> "r"),
    schema, "q-spec", new SerializableHadoopConf(new Configuration(false)))

  test("overwrite(AlwaysTrue) behaves as truncate and builds") {
    val b = builder()
    assert(b.overwrite(Array[Filter](AlwaysTrue())) eq b)
    val w = b.build()
    assert(w.description().contains("truncate"))
  }

  test("selective overwrite filters are rejected at plan time") {
    val e = intercept[UnsupportedOperationException] {
      builder().overwrite(Array[Filter](EqualTo("id", 7L)))
    }
    assert(e.getMessage.contains("always-true"), e.getMessage)
  }

  test("empty filter array means unconditional overwrite (truncate)") {
    // Spark models DELETE-all / overwrite-everything as zero conjuncts
    val w = builder().overwrite(Array.empty[Filter]).build()
    assert(w.description().contains("truncate"))
  }
}
