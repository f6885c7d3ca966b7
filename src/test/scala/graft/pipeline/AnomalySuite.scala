package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class AnomalySuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(
      series: Seq[(String, Long, Long)],
      window: Int = 24,
      zPermille: Long = 3000L,
      minHistory: Int = 6): Map[(String, Long), (Long, Boolean, Int)] =
    Sessionize.rollingAnomalies(
        series.toDF("k", "b", "cnt"), "k", "b", "cnt",
        window, zPermille, minHistory)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(5), r.getInt(6))))
      .toMap

  /** Integer replay of the documented z² test. */
  private def replay(
      counts: Seq[Long], window: Int, zPermille: Long, minHistory: Int): Seq[(Boolean, Int)] =
    counts.indices.map { i =>
      val hist = counts.slice(math.max(0, i - window), i)
      val n = hist.size.toLong
      if (n < minHistory) (false, 0)
      else {
        val s1 = hist.sum
        val s2 = hist.map(x => BigInt(x) * x).sum
        val dev = counts(i) * n - s1
        val varN2 = n * s2 - BigInt(s1) * s1
        val flag =
          if (varN2 == 0) dev != 0
          else BigInt(dev) * dev * 1000000 > zPermille * zPermille * varN2
        (flag, if (!flag) 0 else if (dev > 0) 1 else -1)
      }
    }

  test("spike over a flat history flags via the zero-variance branch") {
    val counts = Seq(10L, 10L, 10L, 10L, 10L, 10L, 100L)
    val got = run(counts.zipWithIndex.map { case (c, i) => ("a", i.toLong, c) })
    assert(got(("a", 5L)) === ((5L, false, 0))) // history 5 < minHistory
    assert(got(("a", 6L)) === ((6L, true, 1)))
  }

  test("flags match the integer replay on a noisy series, both directions") {
    val counts = Seq[Long](10, 12, 10, 12, 10, 12, 13, 11, 2, 10, 11, 30, 10)
    val got = run(counts.zipWithIndex.map { case (c, i) => ("s", i.toLong, c) },
      window = 8, zPermille = 2500L, minHistory = 4)
    val want = replay(counts, 8, 2500L, 4)
    counts.indices.foreach { i =>
      val (_, flag, dir) = got(("s", i.toLong))
      assert((flag, dir) === want(i), s"bucket $i")
    }
    assert(want.exists(_._2 == 1) && want.exists(_._2 == -1),
      "fixture must exercise both directions")
  }

  test("ROWS semantics: gaps in the bucket axis are skipped, not zero-filled") {
    // identical counts on sparse buckets: zero variance, no anomaly
    val sparse = Seq(("g", 1L, 5L), ("g", 100L, 5L), ("g", 200L, 5L),
      ("g", 300L, 5L), ("g", 400L, 5L), ("g", 500L, 5L), ("g", 600L, 5L))
    val got = run(sparse, minHistory = 6)
    assert(got(("g", 600L)) === ((6L, false, 0)))
  }

  test("ewmaSmooth: partial head means, weight table exact, keys independent") {
    val ws = Sessionize.ewmaWeights(500, 3) // 1e6, 5e5, 25e4
    assert(ws === Seq(1000000L, 500000L, 250000L))
    val df = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 4.0),
      ("b", 0L, 10.0)).toDF("k", "t", "v")
    val got = Sessionize.ewmaSmooth(df, Seq("k"), "t", "v",
        decayPermille = 500, window = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    // t=0: only itself -> 1e6 exactly (partial mean, not zero-diluted)
    assert(got(("a", 0L)) === 1000000L)
    // t=1: (2e6*1e6 + 1e6*5e5) div 1.5e6 = 2.5e12 div 1.5e6
    assert(got(("a", 1L)) === 2500000000000L / 1500000L)
    // t=2: (4e6*1e6 + 2e6*5e5 + 1e6*25e4) div 1.75e6
    assert(got(("a", 2L)) === 5250000000000L / 1750000L)
    assert(got(("b", 0L)) === 10000000L)
  }

  test("keys are independent windows") {
    val two = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("b", 1L, 999L))
    val got = run(two, minHistory = 2)
    assert(got(("b", 1L))._1 === 0L, "b must not see a's history")
  }
}
