package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class GraphSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Total = 1000000000000L

  /** Scala replay of the documented integer recurrence. */
  private def replay(
      edges: Seq[(String, String)], iterations: Int, damping: Int = 850): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size.toLong
    val r0 = Total / n
    val base = ((1000 - damping) * r0) / 1000
    var ranks = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iterations) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => ranks(src) / outdeg(src) }.sum
      }
      ranks = nodes.map(v => v -> (base + (damping * in.getOrElse(v, 0L)) / 1000)).toMap
    }
    ranks
  }

  private def run(edges: Seq[(String, String)], iterations: Int): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("pageRank matches the integer recurrence replay on a cyclic graph") {
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "a", // 3-cycle
      "d" -> "a", "d" -> "b", // fan-out
      "e" -> "a") // e is a source, a is popular
    for (iters <- Seq(1, 3, 5)) {
      assert(run(edges, iters) === replay(edges, iters), s"iters=$iters")
    }
  }

  test("popular node outranks sources; sinks keep only the base share") {
    val edges = Seq("a" -> "hub", "b" -> "hub", "c" -> "hub", "hub" -> "out")
    val ranks = run(edges, 5)
    assert(ranks("hub") > ranks("a"))
    assert(ranks("out") > ranks("a")) // fed by hub
    // a, b, c have no in-edges: exactly the damped base share
    assert(ranks("a") === ranks("b") && ranks("b") === ranks("c"))
  }

  test("parallel edges count once and null endpoints drop") {
    val dup = Seq("a" -> "b", "a" -> "b", "a" -> "c")
    assert(run(dup, 3) === replay(Seq("a" -> "b", "a" -> "c"), 3))
    val withNull = Seq(("a", "b"), ("a", null), (null, "b"))
      .toDF("src", "dst")
    val ranks = Graph.pageRank(withNull, "src", "dst", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks.keySet === Set("a", "b"))
    assert(ranks === replay(Seq("a" -> "b"), 2))
  }

  test("dangling mass is dropped: totals shrink but stay comparable") {
    val edges = Seq("a" -> "sink", "b" -> "sink")
    val ranks = run(edges, 5)
    // sink never redistributes, so total mass is below Total but positive
    val total = ranks.values.sum
    assert(total > 0 && total < Total)
    assert(ranks("sink") > ranks("a"))
  }

  test("rejects bad parameters") {
    val e = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(e, "src", "dst", 1, dampingPermille = 1001))
  }
}
