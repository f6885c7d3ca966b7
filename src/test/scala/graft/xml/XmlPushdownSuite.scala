package graft.xml

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class XmlPushdownSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val opts = XmlOptions(Map("rowTag" -> "r"))
  private val schema = StructType(Seq(
    StructField("name", StringType), StructField("n", LongType),
    StructField("note", StringType)))

  test("compile: substring-safe string predicates only") {
    def c(fs: Filter*) = RawRecordFilter.compile(fs.toArray, schema, opts).map(_.toSeq).toSeq
    assert(c(EqualTo("name", "bob")) === Seq(Seq("bob")))
    assert(c(StringContains("note", "xyz")) === Seq(Seq("xyz")))
    assert(c(In("name", Array("a1", "b2"))) === Seq(Seq("a1", "b2")))
    // numeric column, escapable / non-ASCII values, corrupt column: skipped
    assert(c(EqualTo("n", 5L)) === Seq.empty)
    assert(c(EqualTo("name", "a&b")) === Seq.empty)
    assert(c(EqualTo("name", "café")) === Seq.empty)
    assert(c(EqualTo("_corrupt_record", "x")) === Seq.empty)
    // And keeps whichever sides compile; Or needs both
    assert(c(And(EqualTo("name", "bob"), GreaterThan("n", 1L))) === Seq(Seq("bob")))
    assert(c(And(EqualTo("name", "bob"), EqualTo("note", "hi"))) ===
      Seq(Seq("bob"), Seq("hi")))
    assert(c(Or(EqualTo("name", "bob"), EqualTo("note", "hi"))) === Seq(Seq("bob", "hi")))
    assert(c(Or(EqualTo("name", "bob"), GreaterThan("n", 1L))) === Seq.empty)
  }

  test("filtered reads are identical with and without the raw pre-test") {
    val xml = new StringBuilder("<rows>\n")
    (0 until 500).foreach { i =>
      val name = if (i % 100 == 0) "alice" else s"user$i"
      val note = if (i % 250 == 1) "A&amp;B" else s"note $i"
      xml.append(s"<r><name>$name</name><n>$i</n><note>$note</note></r>\n")
    }
    xml.append("</rows>\n")
    val dir = Files.createTempDirectory("graft_pushdown")
    val f = dir.resolve("data.xml")
    Files.write(f, xml.toString.getBytes("UTF-8"))

    def read(push: Boolean) = spark.read.format("graft.xml")
      .option("rowTag", "r").option("rawFilterPushdown", push.toString)
      .schema(schema).load(f.toString)

    for (push <- Seq(true, false)) {
      val eq = read(push).filter(col("name") === "alice").select("n")
        .collect().map(_.getLong(0)).sorted
      assert(eq.toSeq === (0 until 500 by 100).map(_.toLong), s"push=$push")
      // value that appears escaped in the document: not compiled, still exact
      val amp = read(push).filter(col("note") === "A&B").count()
      assert(amp === 2, s"push=$push")
      val in = read(push).filter(col("name").isin("user7", "user8")).count()
      assert(in === 2, s"push=$push")
      val contains = read(push).filter(col("note").contains("note 49")).count()
      assert(contains === 11, s"push=$push") // 49, 490-499
    }
  }

  test("explain shows pushed filters at the scan") {
    val dir = Files.createTempDirectory("graft_pushdown2")
    val f = dir.resolve("d.xml")
    Files.write(f, "<rows><r><name>a</name><n>1</n><note>x</note></r></rows>".getBytes)
    val df = spark.read.format("graft.xml").option("rowTag", "r")
      .schema(schema).load(f.toString)
      .filter(col("name") === "a")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(name,a)"), plan)
  }
}
