package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class LinkageLayoutSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val catalog = Seq(
    (1L, "B1", "red widget"),
    (2L, "B1", "red widgets"), // distance 1 from "red widget"
    (3L, "B1", "blue bolt"),
    (4L, "B2", "red widget") // same name, other block: must NOT match B1 rows
  ).toDF("p_partkey", "p_brand", "p_name")

  test("linkByEditDistance: exact beats near, ties break on lowest id") {
    val dirty = Seq(
      (100L, "B1", "red widget"), // exact: id 1 at distance 0 (not id 2 at 1)
      (101L, "B1", "red widgett"), // distance 1 to BOTH 1 and 2 -> lowest id 1
      (102L, "B1", "green gear"), // nothing within 2: unmatched
      (103L, "B9", "red widget") // unknown block: unmatched
    ).toDF("import_id", "p_brand", "p_name")
    val got = Linkage.linkByEditDistance(dirty, "import_id", catalog,
        "p_partkey", "p_name", "p_brand", maxDistance = 2)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(5))))).toMap
    assert(got(100L) === ((Some(1L), Some(0))))
    assert(got(101L) === ((Some(1L), Some(1))))
    assert(got(102L) === ((None, None)))
    assert(got(103L) === ((None, None)))
    assert(got.size === 4, "every dirty row must surface exactly once")
  }

  test("linkByEditDistance refuses a block larger than maxBlockSize") {
    val bigBlock = (0 until 50).map(i => (i.toLong, "B1", s"name $i"))
      .toDF("p_partkey", "p_brand", "p_name")
    val dirty = Seq((1L, "B1", "name 1")).toDF("import_id", "p_brand", "p_name")
    val e = intercept[IllegalArgumentException] {
      Linkage.linkByEditDistance(dirty, "import_id", bigBlock,
        "p_partkey", "p_name", "p_brand", maxDistance = 2, maxBlockSize = 10)
    }
    assert(e.getMessage.contains("maxBlockSize"))
  }

  test("injectTypos deletes the seeded char; every third row stays clean") {
    val rows = Seq((0L, "abcdef"), (1L, "abcdef"), (2L, "abcdef"),
        (7L, "abcdef"), (5L, "x"))
      .toDF("seed", "name")
      .select(col("seed"), Linkage.injectTypos("name", "seed").as("out"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(0L) === "abcdef") // 0 % 3 == 0: clean
    assert(rows(1L) === "acdef") // delete 0-based pos 1
    assert(rows(2L) === "abdef") // delete 0-based pos 2
    assert(rows(7L) === "abcdef".patch(7 % 6, "", 1)) // pos 1 -> "acdef"
    assert(rows(5L) === "x") // length 1: untouched
  }

  test("zValue2 interleaves bits (hand example) and orders quadrants") {
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    // x=101, y=011: bits x0..x2 at even slots, y0..y2 at odd:
    // 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    assert(got === 27L)
  }

  test("scaleToBits is truncating integral width-scaling") {
    val r = Seq((0L, 999L), (999L, 999L), (500L, 999L)).toDF("v", "m")
      .select(Layout.scaleToBits(col("v"), col("m"), 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(r === Seq(0L, 255L, 128L))
  }

  test("zOrderExtents on a full 16x16 grid: every bucket is a tight 4x4 tile") {
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong))
      .toDF("xb", "yb")
    val ext = Layout.zOrderExtents(grid, "xb", "yb", bits = 4, buckets = 16)
      .collect()
    assert(ext.length === 16)
    ext.foreach { r =>
      assert(r.getAs[Long]("n_rows") === 16L)
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") === 3L)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") === 3L)
    }
  }

  test("zOrderExtents refuses out-of-range dimensions loudly") {
    val bad = Seq((300L, 2L)).toDF("xb", "yb") // 300 >= 2^8
    val e = intercept[IllegalArgumentException] {
      Layout.zOrderExtents(bad, "xb", "yb", bits = 8, buckets = 4)
    }
    assert(e.getMessage.contains("scaleToBits"))
  }

  test("pruneReport: inclusive overlap, boundary touch scans, empty box refused") {
    val ext = Seq(
      (0L, 10L, 0L, 3L, 0L, 3L),   // fully inside the box
      (1L, 20L, 4L, 7L, 8L, 11L),  // y_max == yLo-? no: y [8,11] vs box y [3,8] -> touches at 8
      (2L, 30L, 9L, 12L, 0L, 2L),  // x [9,12] vs box x [0,8] -> disjoint, skipped
      (3L, 40L, 0L, 1L, 9L, 12L)   // y [9,12] vs box y [3,8] -> disjoint, skipped
    ).toDF("bucket", "n_rows", "x_min", "x_max", "y_min", "y_max")
    val r = Layout.pruneReport(ext, 0L, 8L, 3L, 8L).collect()(0)
    assert(r.getAs[Long]("files_total") === 4L)
    assert(r.getAs[Long]("files_scanned") === 2L)
    assert(r.getAs[Long]("rows_total") === 100L)
    assert(r.getAs[Long]("rows_scanned") === 30L)
    assert(r.getAs[Long]("scan_permille") === 300L)
    intercept[IllegalArgumentException] {
      Layout.pruneReport(ext, 5L, 4L, 0L, 1L)
    }
  }
}
