package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class BudgetSelectSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute-force prefix: (score desc, id asc) order, keep while cum <= budget. */
  private def bruteKeep(rows: Seq[(Long, Long, Long)], budget: Long): Set[Long] = {
    var cum = 0L
    rows.sortBy { case (id, _, score) => (-score, id) }
      .takeWhile { case (_, tc, _) => { cum += tc; cum <= budget } }
      .map(_._1).toSet
  }

  test("selectByTokenBudget equals the naive global-window prefix") {
    val rnd = new Random(5)
    // many ties: scores in 0..9, tokens 1..40
    val rows = (0L until 500L).map(id => (id, 1L + rnd.nextInt(40), rnd.nextInt(10).toLong))
    val df = rows.toDF("id", "tc", "score")
    for (budget <- Seq(0L, 37L, 1000L, 5000L, 100000L)) {
      val got = Sampling.selectByTokenBudget(df, "id", "tc", "score", budget)
        .select("id").as[Long].collect().toSet
      assert(got === bruteKeep(rows, budget), s"budget=$budget")
    }
  }

  test("boundary class cuts by id; higher classes admit wholly") {
    val df = Seq(
      (1L, 10L, 5L), (2L, 10L, 5L),           // score 5: 20 tokens
      (3L, 10L, 3L), (4L, 10L, 3L), (5L, 10L, 3L) // score 3: 30 tokens
    ).toDF("id", "tc", "score")
    // budget 45: all of score 5 (20) + ids 3,4 of score 3 (20+20=40); id 5 would hit 50
    val got = Sampling.selectByTokenBudget(df, "id", "tc", "score", 45L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L))
  }

  test("total within budget admits everything (null boundary path)") {
    val df = Seq((1L, 5L, 2L), (2L, 5L, 1L)).toDF("id", "tc", "score")
    assert(Sampling.selectByTokenBudget(df, "id", "tc", "score", 10L).count() === 2)
  }

  test("budget smaller than the first document admits nothing") {
    val df = Seq((1L, 50L, 9L), (2L, 5L, 1L)).toDF("id", "tc", "score")
    assert(Sampling.selectByTokenBudget(df, "id", "tc", "score", 3L).count() === 0)
  }

  test("near-distinct scores (q235 shape): sharded boundary stays exact") {
    // One distinct score per row — the histogram degenerates to N rows,
    // the exact case the bin-sharded prefix sum exists for. Results must
    // equal the brute-force prefix bit-for-bit, including negative and
    // widely-spread scores (bin arithmetic is decimal-exact).
    val rnd = new Random(11)
    val rows = (0L until 2000L).map { id =>
      (id, 1L + rnd.nextInt(30),
        rnd.nextLong() % 1000000000000L - id) // near-distinct, signed
    }
    val df = rows.toDF("id", "tc", "score")
    for (budget <- Seq(0L, 500L, 9999L, 100000L)) {
      val got = Sampling.selectByTokenBudget(df, "id", "tc", "score", budget)
        .select("id").as[Long].collect().toSet
      assert(got === bruteKeep(rows, budget), s"budget=$budget")
    }
  }

  test("non-integral score column is refused (documented contract)") {
    val df = Seq((1L, 5L, 2.5)).toDF("id", "tc", "score")
    val e = intercept[IllegalArgumentException] {
      Sampling.selectByTokenBudget(df, "id", "tc", "score", 10L)
    }
    assert(e.getMessage.contains("integral"))
  }
}
