package graft.xml

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming composition: the reference has no streaming surface, but our
 * column-function layer composes with Structured Streaming out of the box —
 * `readStream.text` over an XML-records directory + `from_xml` gives an
 * incremental XML pipeline with watermarks/windows available downstream.
 */
class XmlStreamingSuite extends AnyFunSuite {

  test("readStream.text + from_xml parses XML records incrementally") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("batch1.txt"),
      "<r><k>1</k><v>a</v></r>\n<r><k>2</k><v>b</v></r>\n")

    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val parsed = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(in.toString)
      .select(graft.xml.from_xml(col("value"), schema).as("r"))
      .select("r.k", "r.v")

    val query = parsed.writeStream
      .format("memory")
      .queryName("xml_stream_out")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      Files.writeString(in.resolve("batch2.txt"), "<r><k>3</k><v>c</v></r>\n")
      query.processAllAvailable()
      val rows = spark.table("xml_stream_out").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally {
      query.stop()
    }
  }

  test("streaming windowed aggregation over parsed XML events") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream2")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("b1.txt"),
      """<e><ts>2024-01-01T00:00:10Z</ts><kind>x</kind></e>
        |<e><ts>2024-01-01T00:00:20Z</ts><kind>x</kind></e>
        |<e><ts>2024-01-01T00:01:10Z</ts><kind>y</kind></e>
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("kind", StringType)))
    val counts = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(in.toString)
      .select(graft.xml.from_xml(col("value"), schema).as("e"))
      .select("e.ts", "e.kind")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("kind"))
      .count()

    val query = counts.writeStream
      .format("memory").queryName("xml_stream_win").outputMode("complete").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("xml_stream_win")
        .select("kind", "count").orderBy("kind")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows === Seq(("x", 2L), ("y", 1L)))
    } finally {
      query.stop()
    }
  }
}
