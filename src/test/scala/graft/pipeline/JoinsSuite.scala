package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class JoinsSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- asofJoin -----------------------------------------------------------

  private def probeDf = Seq(
    (1L, "k1", 100L),
    (2L, "k1", 250L),
    (3L, "k1", 50L), // before any build row
    (4L, "k2", 500L),
    (5L, "k3", 10L) // key with no build rows at all
  ).toDF("pid", "key", "pts")

  private def buildDf = Seq(
    ("k1", 100L, 10.0), // ties probe 1's ts exactly (inclusive match)
    ("k1", 200L, 20.0),
    ("k2", 400L, 40.0),
    ("k2", 600L, 60.0) // after probe 4 — must not match
  ).toDF("key", "bts", "v")

  test("asof: latest build row at or before each probe ts, per key") {
    val out = Joins.asofJoin(probeDf, buildDf, Seq("key"), "pts", "bts", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) === (Some(100L), Some(10.0))) // inclusive: equal ts matches
    assert(out(2L) === (Some(200L), Some(20.0)))
    assert(out(3L) === (None, None)) // nothing at or before 50
    assert(out(4L) === (Some(400L), Some(40.0))) // 600 is in the future
    assert(out(5L) === (None, None)) // key never built
  }

  test("asof: every probe row and column survives, schema as documented") {
    val out = Joins.asofJoin(probeDf, buildDf, Seq("key"), "pts", "bts", Seq("v"))
    assert(out.columns.toSeq ===
      Seq("pid", "key", "pts", "matched_ts", "matched_v"))
    assert(out.count() === probeDf.count())
  }

  test("asof: tolerance nulls out stale matches") {
    val out = Joins.asofJoin(probeDf, buildDf, Seq("key"), "pts", "bts",
        Seq("v"), toleranceMicros = Some(60L))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(1L) === Some(10.0)) // age 0 <= 60
    assert(out(2L) === Some(20.0)) // age 50 <= 60
    assert(out(4L) === None) // age 100 > 60: stale
  }

  test("asof: duplicate build ts resolves by greatest value digest, deterministically") {
    val probe = Seq((1L, "k", 10L)).toDF("pid", "key", "pts")
    // two build rows tie exactly on (key, ts) — md5("7.0") > md5("3.0")
    // decides, not input order
    val buildA = Seq(("k", 10L, 3.0), ("k", 10L, 7.0)).toDF("key", "bts", "v")
    val buildB = Seq(("k", 10L, 7.0), ("k", 10L, 3.0)).toDF("key", "bts", "v")
    def pick(b: org.apache.spark.sql.DataFrame): Double =
      Joins.asofJoin(probe, b, Seq("key"), "pts", "bts", Seq("v"))
        .head().getAs[Double]("matched_v")
    val a = pick(buildA)
    assert(a === pick(buildB)) // pure function of the input multiset
    val expected = Seq("3.0", "7.0").maxBy(s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(a === expected.toDouble)
  }

  test("asof: brute-force equivalence on a randomized mixed workload") {
    val rnd = new scala.util.Random(42)
    val probes = (1L to 200L).map(i =>
      (i, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
    val builds = (1 to 300).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextInt(50).toDouble))
    val out = Joins.asofJoin(probes.toDF("pid", "key", "pts"),
        builds.toDF("key", "bts", "v"), Seq("key"), "pts", "bts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    probes.foreach { case (pid, key, pts) =>
      val cands = builds.filter(b => b._1 == key && b._2 <= pts)
      val expected =
        if (cands.isEmpty) None
        else {
          val maxTs = cands.map(_._2).max
          // the same digest tie rule the operator documents
          Some(cands.filter(_._2 == maxTs).map(_._3).maxBy(v =>
            java.security.MessageDigest.getInstance("MD5")
              .digest(v.toString.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString))
        }
      assert(out(pid) === expected, s"probe $pid ($key, $pts)")
    }
  }

  test("asof: timestamp-typed columns work and matched_ts is epoch micros") {
    val probe = Seq((1L, "k", java.sql.Timestamp.valueOf("2024-01-01 00:00:10")))
      .toDF("pid", "key", "pts")
    val build = Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 1.5))
      .toDF("key", "bts", "v")
    val r = Joins.asofJoin(probe, build, Seq("key"), "pts", "bts", Seq("v")).head()
    assert(r.getAs[Long]("matched_ts") ===
      java.sql.Timestamp.valueOf("2024-01-01 00:00:05").getTime * 1000L)
    assert(r.getAs[Double]("matched_v") === 1.5)
  }

  test("asof bucketed: equals the single-window join across bucket widths") {
    val rnd = new scala.util.Random(99)
    // duplicate timestamps on both sides, build rows tying on (key, ts),
    // keys with no build rows — everything the tie rule covers
    val probes = (1L to 150L).map(i =>
      (i, s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
    val builds = (1 to 200).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(500).toLong, rnd.nextInt(20).toDouble))
    val p = probes.toDF("pid", "key", "pts")
    val b = builds.toDF("key", "bts", "v")
    val reference = Joins.asofJoin(p, b, Seq("key"), "pts", "bts", Seq("v"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    for (width <- Seq(1L, 7L, 100L, 10000L)) {
      val got = Joins.asofJoinBucketed(p, b, Seq("key"), "pts", "bts", Seq("v"),
          bucketWidthMicros = width)
        .collect().map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
      assert(got === reference, s"width $width")
    }
  }

  test("asof bucketed: carry-in crosses empty buckets and respects tolerance") {
    // build at t=0 only; probes far away in later, build-free buckets
    val p = Seq((1L, "k", 5L), (2L, "k", 95L), (3L, "k", 250L))
      .toDF("pid", "key", "pts")
    val b = Seq(("k", 0L, 42.0)).toDF("key", "bts", "v")
    val plain = Joins.asofJoinBucketed(p, b, Seq("key"), "pts", "bts", Seq("v"), 10L)
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(plain === Map(1L -> Some(42.0), 2L -> Some(42.0), 3L -> Some(42.0)))
    val tol = Joins.asofJoinBucketed(p, b, Seq("key"), "pts", "bts", Seq("v"), 10L,
        toleranceMicros = Some(100L))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(tol === Map(1L -> Some(42.0), 2L -> Some(42.0), 3L -> None))
  }

  test("asof bucketed: a build row in the probe's own bucket beats the carry-in") {
    val p = Seq((1L, "k", 25L), (2L, "k", 21L)).toDF("pid", "key", "pts")
    val b = Seq(("k", 5L, 1.0), ("k", 23L, 2.0)).toDF("key", "bts", "v")
    val got = Joins.asofJoinBucketed(p, b, Seq("key"), "pts", "bts", Seq("v"), 10L)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("matched_v")).toMap
    assert(got === Map(1L -> 2.0, 2L -> 1.0)) // probe 2 precedes the in-bucket build row
  }

  test("asof: a NULL value in the matched row stays NULL — no column tearing") {
    // latest build row has v2 = NULL; an older row has v2 = 9.0. The
    // matched output must be the latest row INTACT (v = 5.0, v2 = null),
    // never a mix of the two rows.
    val probe = Seq((1L, "k", 100L)).toDF("pid", "key", "pts")
    val build = Seq(
      ("k", 10L, 1.0, Some(9.0)),
      ("k", 50L, 5.0, None: Option[Double])
    ).toDF("key", "bts", "v", "v2")
    val r = Joins.asofJoin(probe, build, Seq("key"), "pts", "bts", Seq("v", "v2"))
      .head()
    assert(r.getAs[Long]("matched_ts") === 50L)
    assert(r.getAs[Double]("matched_v") === 5.0)
    assert(r.isNullAt(r.fieldIndex("matched_v2"))) // the matched row's own NULL
    val rb = Joins.asofJoinBucketed(probe, build, Seq("key"), "pts", "bts",
      Seq("v", "v2"), bucketWidthMicros = 30L).head()
    assert(rb.getAs[Long]("matched_ts") === 50L)
    assert(rb.isNullAt(rb.fieldIndex("matched_v2")))
    // carry-in path too: probe in a later, build-free bucket
    val far = Seq((1L, "k", 500L)).toDF("pid", "key", "pts")
    val rc = Joins.asofJoinBucketed(far, build, Seq("key"), "pts", "bts",
      Seq("v", "v2"), bucketWidthMicros = 30L).head()
    assert(rc.getAs[Long]("matched_ts") === 50L)
    assert(rc.isNullAt(rc.fieldIndex("matched_v2")))
  }

  test("asof: NULL keys never match — equi-join convention") {
    val probe = Seq((1L, Some("k"), 100L), (2L, None: Option[String], 100L))
      .toDF("pid", "key", "pts")
    val build = Seq((Some("k"), 10L, 1.0), (None: Option[String], 10L, 2.0))
      .toDF("key", "bts", "v")
    for (df <- Seq(
        Joins.asofJoin(probe, build, Seq("key"), "pts", "bts", Seq("v")),
        Joins.asofJoinBucketed(probe, build, Seq("key"), "pts", "bts", Seq("v"), 50L))) {
      val out = df.collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
      assert(out(1L) === Some(1.0)) // non-null key matches normally
      assert(out(2L) === None) // NULL-key probe survives, unmatched
      assert(df.count() === 2)
    }
  }

  // ---- asofJoinForward / asofJoinNearest ----------------------------------

  test("asof forward: earliest build row at or after each probe ts, per key") {
    val out = Joins.asofJoinForward(probeDf, buildDf, Seq("key"), "pts", "bts", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) === (Some(100L), Some(10.0))) // inclusive: equal ts matches
    assert(out(2L) === (None, None)) // nothing at or after 250 for k1
    assert(out(3L) === (Some(100L), Some(10.0))) // next event after 50
    assert(out(4L) === (Some(600L), Some(60.0))) // 400 is in the past
    assert(out(5L) === (None, None)) // key never built
  }

  test("asof forward: schema, tolerance, and bucketed equivalence") {
    val out = Joins.asofJoinForward(probeDf, buildDf, Seq("key"), "pts", "bts", Seq("v"))
    assert(out.columns.toSeq === Seq("pid", "key", "pts", "matched_ts", "matched_v"))
    // tolerance bounds how far in the FUTURE the match may be
    val tol = Joins.asofJoinForward(probeDf, buildDf, Seq("key"), "pts", "bts",
        Seq("v"), toleranceMicros = Some(60L))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(tol(1L) === Some(10.0)) // distance 0
    assert(tol(3L) === Some(10.0)) // distance 50 <= 60
    assert(tol(4L) === None) // distance 100 > 60
    val rnd = new scala.util.Random(17)
    val p = (1L to 150L).map(i => (i, s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
      .toDF("pid", "key", "pts")
    val b = (1 to 200).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(500).toLong, rnd.nextInt(20).toDouble))
      .toDF("key", "bts", "v")
    val plain = Joins.asofJoinForward(p, b, Seq("key"), "pts", "bts", Seq("v"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    for (width <- Seq(1L, 7L, 100L)) {
      val got = Joins.asofJoinForward(p, b, Seq("key"), "pts", "bts", Seq("v"),
          bucketWidthMicros = Some(width))
        .collect().map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
      assert(got === plain, s"width $width")
    }
  }

  test("asof forward: brute-force equivalence with the digest tie rule") {
    val rnd = new scala.util.Random(23)
    val probes = (1L to 200L).map(i =>
      (i, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
    val builds = (1 to 300).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextInt(50).toDouble))
    val out = Joins.asofJoinForward(probes.toDF("pid", "key", "pts"),
        builds.toDF("key", "bts", "v"), Seq("key"), "pts", "bts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    probes.foreach { case (pid, key, pts) =>
      val cands = builds.filter(b => b._1 == key && b._2 >= pts)
      val expected =
        if (cands.isEmpty) None
        else {
          val minTs = cands.map(_._2).min
          Some(cands.filter(_._2 == minTs).map(_._3).maxBy(v =>
            java.security.MessageDigest.getInstance("MD5")
              .digest(v.toString.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString))
        }
      assert(out(pid) === expected, s"probe $pid ($key, $pts)")
    }
  }

  test("asof nearest: closest build row either way, ties resolve backward") {
    val p = Seq(
      (1L, "k", 100L), // equidistant: build at 90 and 110 — backward wins
      (2L, "k", 95L), // closer to 90
      (3L, "k", 106L), // closer to 110
      (4L, "k", 10L), // only future rows qualify
      (5L, "z", 10L) // key never built
    ).toDF("pid", "key", "pts")
    val b = Seq(("k", 90L, 9.0), ("k", 110L, 11.0)).toDF("key", "bts", "v")
    val out = Joins.asofJoinNearest(p, b, Seq("key"), "pts", "bts", Seq("v"))
    assert(out.columns.toSeq === Seq("pid", "key", "pts", "matched_ts", "matched_v"))
    val m = out.collect().map(r => r.getLong(0) ->
      (Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(m(1L) === Some(90L)) // tie -> backward
    assert(m(2L) === Some(90L))
    assert(m(3L) === Some(110L))
    assert(m(4L) === Some(90L))
    assert(m(5L) === None)
    // tolerance bounds the distance both ways
    val tol = Joins.asofJoinNearest(p, b, Seq("key"), "pts", "bts", Seq("v"),
        toleranceMicros = Some(6L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(tol(2L) === Some(90L)) // distance 5 <= 6
    assert(tol(3L) === Some(110L)) // distance 4
    assert(tol(4L) === None) // distance 80 > 6
  }

  test("asof nearest: brute-force equivalence, plain and bucketed") {
    val rnd = new scala.util.Random(31)
    val probes = (1L to 150L).map(i =>
      (i, s"k${rnd.nextInt(4)}", rnd.nextInt(600).toLong))
    val builds = (1 to 250).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(600).toLong, rnd.nextInt(40).toDouble))
    val p = probes.toDF("pid", "key", "pts")
    val b = builds.toDF("key", "bts", "v")
    def expected(pid: Long, key: String, pts: Long): Option[Long] = {
      val past = builds.filter(x => x._1 == key && x._2 <= pts).map(_._2)
      val fut = builds.filter(x => x._1 == key && x._2 >= pts).map(_._2)
      (past.sorted.lastOption, fut.sorted.headOption) match {
        case (None, None) => None
        case (Some(bk), None) => Some(bk)
        case (None, Some(fw)) => Some(fw)
        case (Some(bk), Some(fw)) =>
          if (pts - bk <= fw - pts) Some(bk) else Some(fw)
      }
    }
    for (width <- Seq(None, Some(25L))) {
      val out = Joins.asofJoinNearest(p, b, Seq("key"), "pts", "bts", Seq("v"),
          bucketWidthMicros = width)
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      probes.foreach { case (pid, key, pts) =>
        assert(out(pid) === expected(pid, key, pts), s"probe $pid ($key, $pts) width $width")
      }
    }
  }

  // ---- rangeJoinByBucket --------------------------------------------------

  private def naiveRange(
      points: Seq[(Long, Long)], intervals: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, pt) <- points
      (iid, lo, hi) <- intervals
      if lo <= pt && pt <= hi
    } yield (pid, iid)).toSet

  test("range: bucket join equals the naive quadratic join, no duplicate pairs") {
    val rnd = new scala.util.Random(7)
    val points = (1L to 300L).map(i => (i, rnd.nextInt(2000).toLong - 500))
    val intervals = (1L to 80L).map { i =>
      val lo = rnd.nextInt(2000).toLong - 500
      (i, lo, lo + rnd.nextInt(300))
    }
    for (width <- Seq(1L, 50L, 1000L)) {
      val rows = Joins.rangeJoinByBucket(
          points.toDF("pid", "pt"), "pt",
          intervals.toDF("iid", "lo", "hi"), "lo", "hi", width)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.size === rows.toSet.size, s"width $width emitted duplicates")
      assert(rows.toSet === naiveRange(points, intervals), s"width $width")
    }
  }

  test("range: inclusive bounds, negative coordinates, malformed intervals drop") {
    val points = Seq((1L, -10L), (2L, 0L), (3L, 10L)).toDF("pid", "pt")
    val intervals = Seq(
      (1L, -10L, -10L), // degenerate single-point interval, negative coord
      (2L, 0L, 10L), // inclusive both ends
      (3L, 5L, 4L) // hi < lo: matches nothing
    ).toDF("iid", "lo", "hi")
    val got = Joins.rangeJoinByBucket(points, "pt", intervals, "lo", "hi", 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("range: extra equi keys restrict matches") {
    val points = Seq((1L, 5L, "a"), (2L, 5L, "b")).toDF("pid", "pt", "grp")
    val intervals = Seq((10L, 0L, 10L, "a")).toDF("iid", "lo", "hi", "grp")
    val got = Joins.rangeJoinByBucket(points, "pt", intervals, "lo", "hi", 4L,
        extraKeyCols = Seq("grp"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("range: plans as a hash join on the bucket key, not a nested loop") {
    val points = spark.range(100).select(col("id").as("pid"), (col("id") * 3).as("pt"))
    val intervals = spark.range(20).select(col("id").as("iid"),
      (col("id") * 10).as("lo"), (col("id") * 10 + 15).as("hi"))
    val plan = Joins.rangeJoinByBucket(points, "pt", intervals, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("scd2Intervals: no-op collapse, open last interval, tie order") {
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(m)
    val ch = Seq(
      // user 1: A, A (no-op), B, B (no-op), A -> intervals A, B, A
      (1L, ts(1000L), 10L, "A"),
      (1L, ts(2000L), 11L, "A"),
      (1L, ts(3000L), 12L, "B"),
      (1L, ts(4000L), 13L, "B"),
      (1L, ts(5000L), 14L, "A"),
      // user 2: equal timestamps, tie decides the order: C then D
      (2L, ts(1000L), 20L, "C"),
      (2L, ts(1000L), 21L, "D"),
      // user 3: null value transitions are null-safe
      (3L, ts(1000L), 30L, null.asInstanceOf[String]),
      (3L, ts(2000L), 31L, null.asInstanceOf[String]),
      (3L, ts(3000L), 32L, "E")
    ).toDF("k", "ts", "tie", "v")
    val got = Joins.scd2Intervals(ch, "k", "ts", "tie", "v")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime,
        if (r.isNullAt(3)) -1L else r.getTimestamp(3).getTime,
        r.getBoolean(4)))
      .sortBy(t => (t._1, t._3, t._5))
    assert(got === Seq(
      (1L, "A", 1000L, 3000L, false),
      (1L, "B", 3000L, 5000L, false),
      (1L, "A", 5000L, -1L, true),
      (2L, "C", 1000L, 1000L, false),
      (2L, "D", 1000L, -1L, true),
      (3L, null, 1000L, 3000L, false),
      (3L, "E", 3000L, -1L, true)))
  }

  test("intervalOverlapJoin: exactly-once pairs, half-open adjacency, hash plan") {
    val a = Seq(
      ("u", 1L, 0L, 100L),   // long span crossing many buckets
      ("u", 2L, 10L, 20L),
      ("u", 3L, 200L, 210L), // overlaps nothing
      ("u", 4L, 5L, 5L)      // invalid (empty) — dropped
    ).toDF("k", "id", "s", "e")
    val b = Seq(
      ("u", 10L, 50L, 60L),  // inside id 1 only
      ("u", 11L, 20L, 30L),  // ADJACENT to id 2 — half-open, no overlap
      ("u", 12L, 0L, 300L)   // overlaps 1, 2, 3
    ).toDF("k", "id", "s", "e")
    val out = Joins.intervalOverlapJoin(a, b, Seq("k"),
      "id", "s", "e", "id", "s", "e", bucketWidth = 7L)
    assert(!out.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(!out.queryExecution.executedPlan.toString.contains("Cartesian"))
    val pairs = out.collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted
    // (2, 11) is the half-open check: [10,20) and [20,30) touch, no pair.
    // (1, 11) overlaps — the long span covers it.
    assert(pairs.toSeq === Seq(
      (1L, 10L, 50L, 60L), (1L, 11L, 20L, 30L), (1L, 12L, 0L, 100L),
      (2L, 12L, 10L, 20L), (3L, 12L, 200L, 210L)))
  }

  test("scd2Merge == full rebuild: boundary no-op, new key, untouched key, refusal") {
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(m)
    val full = Seq(
      // key 1: A before cutoff; batch opens with A (boundary no-op) then B
      (1L, ts(1000L), 10L, "A"), (1L, ts(6000L), 11L, "A"), (1L, ts(7000L), 12L, "B"),
      // key 2: stored only — untouched
      (2L, ts(1000L), 20L, "C"),
      // key 3: batch only — new key
      (3L, ts(6000L), 30L, "D"), (3L, ts(8000L), 31L, "E")
    ).toDF("k", "ts", "tie", "v")
    val cutoff = ts(5000L)
    val stored = Joins.scd2Intervals(
      full.where(col("ts") < lit(cutoff)), "k", "ts", "tie", "v")
    val merged = Joins.scd2Merge(stored,
      full.where(col("ts") >= lit(cutoff)), "k", "ts", "tie", "v")
    val rebuilt = Joins.scd2Intervals(full, "k", "ts", "tie", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime,
        if (r.isNullAt(3)) -1L else r.getTimestamp(3).getTime,
        r.getBoolean(4))).sortBy(t => (t._1, t._3))
    assert(canon(merged).toSeq === canon(rebuilt).toSeq)
    // out-of-order batch refuses loudly
    val e = intercept[IllegalArgumentException] {
      Joins.scd2Merge(stored,
        Seq((1L, ts(500L), 99L, "Z")).toDF("k", "ts", "tie", "v"),
        "k", "ts", "tie", "v")
    }
    assert(e.getMessage.contains("rebuild from the full feed"))
  }

  test("scd2Merge feedWatermark catches a batch behind a collapsed no-op") {
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(m)
    // Key 1's feed ends with a TRAILING NO-OP (A at t=4000) that
    // scd2Intervals collapses — the stored table's surviving watermark
    // is t=1000, so a batch change at t=2000 passes the default probe
    // even though a full-feed rebuild would order it BEFORE the no-op
    // (making the no-op a real change). The feed watermark sees t=4000
    // and refuses.
    val feed = Seq((1L, ts(1000L), 10L, "A"), (1L, ts(4000L), 11L, "A"))
      .toDF("k", "ts", "tie", "v")
    val stored = Joins.scd2Intervals(feed, "k", "ts", "tie", "v")
    val batch = Seq((1L, ts(2000L), 12L, "B")).toDF("k", "ts", "tie", "v")
    // Surviving-rows probe: passes, merged diverges from the rebuild
    // (2 rows vs 3) — the documented caveat, pinned here.
    assert(Joins.scd2Merge(stored, batch, "k", "ts", "tie", "v")
      .count() === 2L)
    assert(Joins.scd2Intervals(feed.unionByName(batch), "k", "ts", "tie", "v")
      .count() === 3L)
    val e = intercept[IllegalArgumentException] {
      Joins.scd2Merge(stored, batch, "k", "ts", "tie", "v",
        feedWatermark = Some(feed))
    }
    assert(e.getMessage.contains("rebuild from the full feed"))
  }

  test("bloomPrunedEquiJoin equals the plain join; nulls match nothing") {
    val large = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (7L, "x"), (9L, "y")
    ).toDF("k", "pay").unionByName(
      Seq((Option.empty[Long], "n")).toDF("k", "pay"))
    val small = Seq((1L, 100L), (3L, 300L), (5L, 500L)).toDF("sk", "sv")
    val got = Joins.bloomPrunedEquiJoin(large, small, "k", "sk",
        mBits = 1024, k = 3)
      .select("k", "pay", "sv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val plain = large.join(small, col("k") === col("sk"))
      .select("k", "pay", "sv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got.toSeq === plain.toSeq)
    assert(got.map(_._1).toSeq === Seq(1L, 3L))
    intercept[IllegalArgumentException] {
      Joins.bloomPrunedEquiJoin(large, small, "k", "sk", mBits = 100)
    }
  }
}
