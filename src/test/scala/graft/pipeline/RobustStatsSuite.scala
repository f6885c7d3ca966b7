package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

/** madOutlierReport + randomProjectSparse: exact-integer replays. */
class RobustStatsSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- madOutlierReport ----------------------------------------------------

  private def mad(
      rows: Seq[(String, Long, java.lang.Double)],
      sigmas: Int = 3): Map[Long, (Long, Long, Long, Boolean)] =
    Profile.madOutlierReport(
        rows.toDF("k", "id", "v"), Seq("k"), "id", "v", sigmas)
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap

  /** The documented rule, replayed naively in Scala. */
  private def replayMad(values: Seq[Double], sigmas: Int)
      : (Long, Long, Seq[Boolean]) = {
    def q(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((xs.size + 1) / 2 - 1) // smallest with cum >= ceil(n/2)
    }
    val micro = values.map(v => math.round(v * 1e6))
    val med = q(micro)
    val devs = micro.map(v => math.abs(v - med))
    val m = q(devs)
    (med, m, devs.map(d => d * 10000L > m * (sigmas * 14826L)))
  }

  test("planted outlier flags; inliers do not") {
    val vals = Seq(10.0, 10.1, 9.9, 10.2, 10.05, 9.95, 10.15, 500.0)
    val out = mad(vals.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, java.lang.Double.valueOf(v)) })
    val (med, m, flags) = replayMad(vals, 3)
    vals.indices.foreach { i =>
      val (vm, medGot, madGot, flag) = out(i.toLong)
      assert(vm === math.round(vals(i) * 1e6))
      assert(medGot === med && madGot === m)
      assert(flag === flags(i), s"row $i")
    }
    assert(out(7L)._4 === true)
    assert(vals.indices.count(i => out(i.toLong)._4) === 1)
  }

  test("MAD of zero: any deviation flags, identical values never") {
    val rows = Seq.tabulate(9)(i => ("a", i.toLong,
      java.lang.Double.valueOf(if (i < 7) 5.0 else 6.0)))
    val out = mad(rows)
    (0 until 7).foreach(i => assert(out(i.toLong)._4 === false))
    assert(out(7L)._4 === true && out(8L)._4 === true)
    assert(out(0L)._3 === 0L)
  }

  test("even-count median takes the lower middle (histogram rule)") {
    val out = mad(Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, java.lang.Double.valueOf(v)) })
    assert(out(0L)._2 === 2000000L)
  }

  test("null values are excluded; groups are independent") {
    val rows = Seq(
      ("a", 0L, java.lang.Double.valueOf(1.0)),
      ("a", 1L, null.asInstanceOf[java.lang.Double]),
      ("a", 2L, java.lang.Double.valueOf(3.0)),
      ("b", 3L, java.lang.Double.valueOf(100.0)))
    val out = mad(rows)
    assert(!out.contains(1L))
    assert(out(3L)._2 === 100000000L && out(3L)._4 === false)
  }

  test("randomized Scala replay") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(101)(rnd.nextDouble() * 40 - 20)
    val out = mad(vals.zipWithIndex.map { case (v, i) =>
      ("g", i.toLong, java.lang.Double.valueOf(v)) }, sigmas = 2)
    val (med, m, flags) = replayMad(vals, 2)
    vals.indices.foreach { i =>
      assert(out(i.toLong) === ((math.round(vals(i) * 1e6), med, m, flags(i))),
        s"row $i")
    }
  }

  // --- psiDriftReport ------------------------------------------------------

  test("PSI is 0 exactly for identical slices and positive under a shift") {
    val a = (0 until 200).map(i => ("k", i.toLong, (i % 50).toDouble))
      .toDF("k", "id", "v")
    import org.apache.spark.sql.functions.col
    val same = Profile.psiDriftReport(a, a, Seq("k"), "v").collect()
    assert(same.length === 1)
    assert(same.head.getLong(3) === 0L) // pn == qn in every bin -> ln = 0
    val b = a.withColumn("v", col("v") * 3)
    val drift = Profile.psiDriftReport(a, b, Seq("k"), "v").collect()
    assert(drift.head.getLong(3) > 0L)
  }

  test("PSI equals the exact Scala replay") {
    val rnd = new scala.util.Random(3)
    val av = Seq.fill(157)(rnd.nextDouble() * 10)
    val bv = Seq.fill(211)(rnd.nextDouble() * 12 - 1)
    val a = av.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("k", "id", "v")
    val b = bv.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("k", "id", "v")
    val got = Profile.psiDriftReport(a, b, Seq("k"), "v").collect().head
    // Replay: histogram-rule deciles of A, count both sides, +1 smoothing,
    // one micro-rounded ln per bin, truncating common-denominator division.
    val qa = av.map(v => math.round(v * 1e6))
    val qb = bv.map(v => math.round(v * 1e6))
    val sorted = qa.sorted
    val cuts = (1 until 10).map(i => i * 100).map { p =>
      sorted(((p * qa.size + 999) / 1000 - 1).toInt)
    }
    def bin(v: Long): Int = cuts.count(v > _)
    val na = (0 until 10).map(k => qa.count(bin(_) == k).toLong)
    val nb = (0 until 10).map(k => qb.count(bin(_) == k).toLong)
    val (ta, tb) = (qa.size.toLong, qb.size.toLong)
    val s = (0 until 10).map { k =>
      val pn = BigInt(na(k) + 1) * (tb + 10)
      val qn = BigInt(nb(k) + 1) * (ta + 10)
      (pn - qn) * BigInt(math.round(
        math.log(pn.toDouble / qn.toDouble) * 1e6))
    }.sum
    val want = s / (BigInt(ta + 10) * (tb + 10))
    assert(got.getLong(1) === ta && got.getLong(2) === tb)
    assert(got.getLong(3) === want.toLong)
  }

  // --- winsorizeReport -----------------------------------------------------

  test("winsorize clips to the histogram-rule cuts, inliers untouched") {
    val vals = (1 to 100).map(_.toDouble)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, java.lang.Double.valueOf(v)) }
    val got = Profile.winsorizeReport(
        rows.toDF("k", "id", "v"), Seq("k"), "id", "v", 50, 950)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // n=100: lo cut = ceil(50*100/1000)=5th value = 5.0; hi = 95th = 95.0
    assert(got(0L) === ((5000000L, 95000000L, 5000000L))) // 1.0 -> 5.0
    assert(got(49L) === ((5000000L, 95000000L, 50000000L))) // untouched
    assert(got(99L) === ((5000000L, 95000000L, 95000000L))) // 100 -> 95
  }

  // --- ngramNoveltyReport --------------------------------------------------

  test("novelty attributes first occurrence to the minimal doc id") {
    val docs = Seq(
      (10L, "a b c d"), // grams: "a b c", "b c d" -> both first here
      (20L, "a b c d"), // same grams, later doc -> 0 novel
      (30L, "b c d e"), // "b c d" seen, "c d e" new -> 1/2
      (40L, "x"), // shorter than n -> no grams, null permille
      (50L, "p q r s t")) // all new
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNoveltyReport(docs, "doc_id", "text", 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(10L) === ((2L, 2L, 1000L)))
    assert(got(20L) === ((2L, 0L, 0L)))
    assert(got(30L) === ((2L, 1L, 500L)))
    assert(got(40L) === ((0L, 0L, -1L)))
    assert(got(50L) === ((3L, 3L, 1000L)))
  }

  // --- randomProjectSparse -------------------------------------------------

  private def signOf(seed: String, dim: Long, k: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed|$dim|$k".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(24, 32), 16) % 6 match {
      case 0 => 1L
      case 1 => -1L
      case _ => 0L
    }
  }

  test("projection equals the exact Scala replay") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.tabulate(20)(i =>
      (i.toLong, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
    val got = Similarity.randomProjectSparse(
        vecs.toDF("id", "vec"), "id", "vec", inDims = 8, outDims = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for {
      (id, vec) <- vecs
      k <- 0L until 4L
      s = vec.indices.map(j =>
        signOf("rp", j.toLong, k) * math.round(vec(j).toDouble * 1e6)).sum
    } yield (id, k) -> s).toMap
    // Output k rows exist iff some sign in that column is nonzero.
    val liveK = (0L until 4L).filter(k =>
      (0 until 8).exists(j => signOf("rp", j.toLong, k) != 0L)).toSet
    assert(got.keySet === want.keySet.filter { case (_, k) => liveK(k) })
    got.foreach { case (key, v) => assert(v === want(key), s"$key") }
  }

  test("deterministic across runs and independent of row order") {
    val vecs = Seq.tabulate(10)(i =>
      (i.toLong, Seq.tabulate(8)(j => (i * 0.1f + j * 0.01f))))
    def run(vs: Seq[(Long, Seq[Float])]) =
      Similarity.randomProjectSparse(
          vs.toDF("id", "vec"), "id", "vec", 8, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(run(vecs) === run(scala.util.Random.shuffle(vecs)))
  }

  test("refuses non-positive dims") {
    val df = Seq((1L, Seq(1.0f))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Similarity.randomProjectSparse(df, "id", "vec", 0, 4)
    }
  }

  // --- theilSenTrend ---------------------------------------------------------

  test("theilSenTrend: outlier-proof median slope, quadratic refusal") {
    // y = 2x except one glitched point; least squares would bend, the
    // pairwise-slope median does not. Slopes in milli-micro per t-unit.
    val pts = Seq(("a", 0L, 0.0), ("a", 1L, 2.0), ("a", 2L, 4.0),
      ("a", 3L, 6.0), ("a", 4L, 1000.0))
    val got = Profile.theilSenTrend(pts.toDF("k", "t", "v"), Seq("k"), "t", "v")
      .collect().head
    assert(got.getLong(1) === 2000000L * 1000) // 2.0/unit in milli-micro
    assert(got.getLong(2) === 10L)             // C(5,2) pairs
    intercept[IllegalArgumentException] {
      Profile.theilSenTrend(
        (0 until 20).map(i => ("a", i.toLong, 1.0)).toDF("k", "t", "v"),
        Seq("k"), "t", "v", maxPoints = 10)
    }
  }

  // --- mutualInformation -----------------------------------------------------

  test("mutualInformation: 0 for independence, ln 2 for identity, nulls count") {
    val indep = (0 until 64).map(i => (i % 2, (i / 2) % 2)).toDF("a", "b")
    assert(Profile.mutualInformation(indep, "a", "b")
      .collect().head.getLong(2) === 0L)
    val ident = (0 until 64).map(i => (i % 2, i % 2)).toDF("a", "b")
    assert(Profile.mutualInformation(ident, "a", "b")
      .collect().head.getLong(2) === 693147L) // ln 2 in micro-nats
    val withNull = Seq((Some(1), Some(1)), (None, None), (Some(1), None))
      .toDF("a", "b")
    assert(Profile.mutualInformation(withNull, "a", "b")
      .collect().head.getLong(1) === 3L) // 3 distinct cells incl. NULLs
  }

  // --- quantileBins ----------------------------------------------------------

  test("quantileBins: equal-population deciles, ties to the lower bin, nulls out") {
    val rows = (1 to 100).map(i => ("a", i.toLong,
      java.lang.Double.valueOf(i.toDouble))) :+
      (("a", 200L, null.asInstanceOf[java.lang.Double]))
    val got = Profile.quantileBins(rows.toDF("k", "id", "v"),
        Seq("k"), "id", "v", bins = 10)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(!got.contains(200L))
    // 1..100 into deciles: cut_p = the p-th percentile value (10,20,...,90)
    assert(got(1L) === 0)
    assert(got(10L) === 0)   // equal to the first cut -> lower bin
    assert(got(11L) === 1)
    assert(got(55L) === 5)
    assert(got(100L) === 9)
    assert((1 to 100).map(i => got(i.toLong)).groupBy(identity)
      .forall(_._2.size === 10)) // exactly equal-population
  }

  // --- snapshotDiff ----------------------------------------------------------

  test("snapshotDiff: added/removed/changed with column lists, unchanged omitted") {
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L),
      (4L, null.asInstanceOf[String], 40L)).toDF("k", "s", "n")
    val b = Seq((1L, "x", 10L),            // unchanged -> omitted
      (2L, "Y", 21L),                      // both columns changed
      (4L, "now", 40L),                    // null -> value IS a change
      (5L, "new", 50L)                     // added
    ).toDF("k", "s", "n")                  // 3 removed
    val got = Profile.snapshotDiff(a, b, "k", Seq("s", "n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got === Map(
      2L -> (("changed", "s,n")),
      3L -> (("removed", "")),
      4L -> (("changed", "s")),
      5L -> (("added", ""))))
  }
}
