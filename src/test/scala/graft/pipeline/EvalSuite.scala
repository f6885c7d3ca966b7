package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class EvalSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pairSetMetrics counts tp/fp/fn exactly; duplicates collapse first") {
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val pred = Seq((1L, 2L), (1L, 2L), (3L, 4L), (9L, 10L)).toDF("id_a", "id_b")
    val r = Eval.pairSetMetrics(pred, truth).collect().head
    assert(r.getLong(0) === 2L) // tp: (1,2),(3,4) — the dup counted once
    assert(r.getLong(1) === 1L) // fp: (9,10)
    assert(r.getLong(2) === 2L) // fn: (5,6),(7,8)
    assert(r.getDouble(3) === 2.0 / 3.0)
    assert(r.getDouble(4) === 0.5)
  }

  test("pairSetMetrics: empty denominators yield null, not fake scores") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val some = Seq((1L, 2L)).toDF("id_a", "id_b")
    val noPred = Eval.pairSetMetrics(empty, some).collect().head
    assert(noPred.isNullAt(3)) // precision undefined
    assert(noPred.getDouble(4) === 0.0)
    val noTruth = Eval.pairSetMetrics(some, empty).collect().head
    assert(noTruth.getDouble(3) === 0.0)
    assert(noTruth.isNullAt(4)) // recall undefined
  }

  test("percentileCalibrate: permille ranks per group, ties share, singleton is 0") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L), ("a", 4L, 40L), ("a", 5L, 50L),
      ("b", 6L, 7L)
    ).toDF("src", "id", "score")
    val out = Eval.percentileCalibrate(df, "src", "score")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // group a: n=5, rank0 of 10->0, 20->1 (both), 40->3, 50->4; x1000 div 4
    assert(out === Map(1L -> 0L, 2L -> 250L, 3L -> 250L, 4L -> 750L,
      5L -> 1000L, 6L -> 0L))
    // layout invariance
    val re = Eval.percentileCalibrate(df.repartition(7), "src", "score")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(re === out)
  }

  test("perfect prediction scores 1.0 both ways") {
    val s = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Eval.pairSetMetrics(s, s).collect().head
    assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 1.0)
  }
}
