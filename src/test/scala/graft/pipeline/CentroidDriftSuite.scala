package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class CentroidDriftSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(rows: Seq[(String, Seq[Float])]) =
    rows.toDF("grp", "vec")

  /** The documented recurrence in plain Scala. */
  private def replay(
      a: Seq[(String, Seq[Float])], b: Seq[(String, Seq[Float])]):
      Map[String, (Long, Long, Option[Long], Option[Long])] = {
    def q(x: Float): Long = math.round(x.toDouble * 1000000.0)
    def centroid(vs: Seq[Seq[Float]]): Seq[Long] =
      vs.head.indices.map(i => vs.map(v => q(v(i))).sum / vs.size)
    val groups = (a.map(_._1) ++ b.map(_._1)).distinct
    groups.map { g =>
      val va = a.filter(_._1 == g).map(_._2)
      val vb = b.filter(_._1 == g).map(_._2)
      val dists =
        if (va.isEmpty || vb.isEmpty) (None, None)
        else {
          val d = centroid(va).zip(centroid(vb)).map { case (x, y) => math.abs(x - y) }
          (Some(d.sum), Some(d.max))
        }
      g -> (va.size.toLong, vb.size.toLong, dists._1, dists._2)
    }.toMap
  }

  private def run(a: Seq[(String, Seq[Float])], b: Seq[(String, Seq[Float])]) =
    Similarity.centroidDrift(df(a), df(b), "grp", "vec")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap

  test("identical slices drift zero; shifted slice reports the exact shift") {
    val a = Seq("g" -> Seq(1.0f, 2.0f), "g" -> Seq(3.0f, 4.0f))
    assert(run(a, a)("g") === (2L, 2L, Some(0L), Some(0L)))
    // shift every element by +0.5 → both centroid elements move 500000
    val b = a.map { case (g, v) => g -> v.map(_ + 0.5f) }
    assert(run(a, b)("g") === (2L, 2L, Some(1000000L), Some(500000L)))
  }

  test("matches the integer replay on randomized multi-group slices") {
    val rnd = new scala.util.Random(5)
    def mk(n: Int) = (1 to n).map(_ =>
      s"g${rnd.nextInt(4)}" -> Seq.fill(8)(rnd.nextFloat() * 4 - 2))
    val a = mk(60)
    val b = mk(45)
    assert(run(a, b) === replay(a, b))
  }

  test("groups missing from one slice appear with null distances") {
    val a = Seq("both" -> Seq(1.0f), "onlyA" -> Seq(2.0f))
    val b = Seq("both" -> Seq(1.0f))
    val out = run(a, b)
    assert(out("onlyA") === (1L, 0L, None, None))
    assert(out("both") === (1L, 1L, Some(0L), Some(0L)))
  }

  test("negative elements divide toward zero, matching the oracle's //") {
    // centroid micro sum -3 over 2 vectors: -3 div 2 = -1 (truncation),
    // not -2 (floor) — pinned so a refactor to floor-div breaks loudly
    val a = Seq("g" -> Seq(-1e-6f), "g" -> Seq(-2e-6f))
    val b = Seq("g" -> Seq(0f), "g" -> Seq(0f))
    assert(run(a, b)("g") === (2L, 2L, Some(1L), Some(1L)))
  }
}
