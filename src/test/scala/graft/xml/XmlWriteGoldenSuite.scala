package graft.xml

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/**
 * Byte-level golden test for the write path: the exact bytes a part file
 * carries, including the default XML declaration with `standalone="yes"`
 * (reference default: src/main/scala/com/databricks/spark/xml/
 * XmlOptions.scala:76), attribute-before-element ordering, 4-space
 * indentation, entity escaping, and the root close tag. Guards against
 * silent drift in output formatting that users diff against reference-
 * written files.
 */
class XmlWriteGoldenSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def partText(out: String): String =
    Files.list(new java.io.File(out).toPath).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .map(Files.readString).mkString

  test("default write emits the reference declaration and exact layout") {
    import spark.implicits._
    val df = Seq(("fiction", "Dune & more", 9.5)).toDF("_genre", "title", "price")
    val out = Files.createTempDirectory("graft-golden").resolve("books").toString
    df.coalesce(1).write.format("graft.xml").mode("overwrite")
      .option("rowTag", "book").option("rootTag", "catalog").save(out)
    val golden =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<catalog>
        |    <book genre="fiction">
        |        <title>Dune &amp; more</title>
        |        <price>9.5</price>
        |    </book>
        |</catalog>
        |""".stripMargin
    assert(partText(out) === golden)
  }

  test("compactOutput writes one line per record and round-trips") {
    import spark.implicits._
    val df = Seq(("fiction", "Dune & more", 9.5), ("sci", "Foundation", 7.25))
      .toDF("_genre", "title", "price")
    val out = Files.createTempDirectory("graft-golden-compact").resolve("books").toString
    df.coalesce(1).write.format("graft.xml").mode("overwrite")
      .option("rowTag", "book").option("rootTag", "catalog")
      .option("compactOutput", "true").save(out)
    val golden =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<catalog>
        |<book genre="fiction"><title>Dune &amp; more</title><price>9.5</price></book>
        |<book genre="sci"><title>Foundation</title><price>7.25</price></book>
        |</catalog>
        |""".stripMargin
    assert(partText(out) === golden)
    val back = spark.read.format("graft.xml").option("rowTag", "book").load(out)
    assert(back.count() === 2)
    assert(back.filter("_genre = 'sci'").select("title").head().getString(0) === "Foundation")
  }

  test("declaration override and empty declaration") {
    import spark.implicits._
    val df = Seq(Tuple1(1L)).toDF("id")
    val dir = Files.createTempDirectory("graft-golden-decl")
    val custom = dir.resolve("custom").toString
    df.coalesce(1).write.format("graft.xml").mode("overwrite")
      .option("rowTag", "r").option("declaration", """version="1.1"""").save(custom)
    assert(partText(custom).startsWith("<?xml version=\"1.1\"?>\n<ROWS>"))
    val none = dir.resolve("none").toString
    df.coalesce(1).write.format("graft.xml").mode("overwrite")
      .option("rowTag", "r").option("declaration", "").save(none)
    assert(partText(none).startsWith("<ROWS>"))
  }
}
