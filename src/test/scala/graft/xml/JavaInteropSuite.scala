package graft.xml

import org.scalatest.funsuite.AnyFunSuite

/**
 * Drives [[JavaXmlInterop]] — plain-Java code exercising the reader/writer,
 * the `graft.xml.functions` facade, schema inference, and SQL DDL — proving
 * the whole public surface is reachable without Scala syntax (implicits,
 * default arguments, package objects).
 */
class JavaInteropSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("java reader/writer roundtrip") {
    val out = java.nio.file.Files.createTempDirectory("graft_java_xml").toString + "/nation"
    val n = JavaXmlInterop.roundtripCount(
      spark, "/root/testdata/sf0.001/nation.parquet", out)
    assert(n === 25L)
    assert(JavaXmlInterop.sqlViewCount(spark, out) === 25L)
  }

  test("java from_xml facade") {
    val row = JavaXmlInterop.fromXmlRow(spark)
    assert(row.getLong(0) === 7L)
    assert(row.getString(1) === "hi")
  }

  test("java schema inference") {
    assert(JavaXmlInterop.inferredDdl(spark) === "a BIGINT,b STRING")
  }

  test("pipeline operators drive from plain Java via static forwarders") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"), // exact dup -> collapses
      (3L, "another document body")
    ).toDF("doc_id", "text")
    assert(JavaXmlInterop.pipelineFromJava(docs) === 2L)
  }
}
