package graft.pipeline

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqSketch
import graft.xml.SparkTestSession

class HeavyHittersSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- sketch-level invariants (pure JVM, no Spark) ----

  private def exactCounts(tokens: Seq[String]): Map[String, Long] =
    tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def checkInvariants(s: FreqSketch, truth: Map[String, Long]): Unit = {
    assert(s.total === truth.values.sum)
    assert(s.err <= s.total / (s.capacity + 1))
    truth.foreach { case (tok, n) =>
      s.counts.get(tok) match {
        case Some(est) =>
          assert(est <= n, s"overcount for $tok")
          assert(n - est <= s.err, s"undercount beyond err for $tok")
        case None =>
          assert(n <= s.err, s"dropped $tok with freq $n > err ${s.err}")
      }
    }
  }

  test("MG invariants hold under adversarial updates (capacity << distinct)") {
    val rnd = new Random(7)
    // zipf-ish: token i appears ~ 3000/i times, 400 distinct, capacity 16
    val tokens = (1 to 400).flatMap(i => Seq.fill(3000 / i)(s"t$i"))
    val shuffled = rnd.shuffle(tokens)
    val s = new FreqSketch(16)
    shuffled.foreach(s.add)
    checkInvariants(s, exactCounts(tokens))
  }

  test("MG merge preserves invariants across arbitrary splits") {
    val rnd = new Random(11)
    val tokens = rnd.shuffle((1 to 200).flatMap(i => Seq.fill(1000 / i)(s"w$i")))
    val truth = exactCounts(tokens)
    // split into 8 shards, sketch each, merge pairwise like a tree
    var sketches = tokens.grouped(tokens.size / 8 + 1).map { shard =>
      val s = new FreqSketch(12); shard.foreach(s.add); s
    }.toSeq
    while (sketches.size > 1) {
      sketches = sketches.grouped(2).map {
        case Seq(a, b) => a.mergeIn(b); a
        case Seq(a) => a
      }.toSeq
    }
    checkInvariants(sketches.head, truth)
  }

  test("serialize/deserialize round-trips the sketch verbatim") {
    val agg = graft.functions.FrequentCandidates(
      org.apache.spark.sql.graft.Bridge.expression(
        org.apache.spark.sql.functions.lit(null)), 8)
    val s = new FreqSketch(8)
    Seq("a", "b", "a", "c", "日本語", "a").foreach(s.add)
    val back = agg.deserialize(agg.serialize(s))
    assert(back.total === s.total)
    assert(back.err === s.err)
    assert(back.counts.toMap === s.counts.toMap)
  }

  // ---- operator-level: exactness and the completeness guard ----

  test("heavyHitters is exact vs a brute-force count") {
    val rnd = new Random(3)
    val vocab = (1 to 300).map(i => s"v$i")
    val docs = (0 until 400).map { id =>
      val n = 5 + rnd.nextInt(30)
      (id.toLong, Seq.fill(n)(vocab(math.min(rnd.nextInt(300), rnd.nextInt(300)))).mkString(" "))
    }.toDF("doc_id", "text")
    docs.cache().count()
    val threshold = 40L
    val got = HeavyHitters.heavyHitters(docs, "text", threshold, capacity = 2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = docs.collect().flatMap(_.getString(1).split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= threshold).toMap
    assert(got === truth)
    docs.unpersist()
  }

  /** Scala replay of the md5("r:t") mod width cell address. */
  private def cmsCell(token: String, row: Int, width: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$row:$token".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 15), 16) % width
  }

  test("countMinSketch estimates replay exactly and never undercount") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 50).map(i => s"tok$i")
    val docs = (0 until 300).map { id =>
      (id.toLong, Seq.fill(8)(vocab(rnd.nextInt(50))).mkString(" "))
    }.toDF("doc_id", "text")
    docs.cache().count()
    val (depth, width) = (4, 64) // narrow on purpose: collisions must occur
    val sketch = HeavyHitters.countMinSketch(docs, "text", depth, width)
    val cells = sketch.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val truth = docs.collect().flatMap(_.getString(1).split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // cell contents replay: each cell's count = Σ truth over tokens hashing there
    val expectedCells = truth.toSeq
      .flatMap { case (t, n) => (0 until depth).map(r => (r, cmsCell(t, r, width)) -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(cells === expectedCells)
    val items = vocab.toDF("token")
    val est = HeavyHitters.cmsEstimates(sketch, items, "token", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vocab.foreach { t =>
      val exact = truth.getOrElse(t, 0L)
      val expected = (0 until depth)
        .map(r => expectedCells.getOrElse((r, cmsCell(t, r, width)), 0L)).min
      assert(est(t) === expected, s"estimate replay for $t")
      assert(est(t) >= exact, s"one-sided error violated for $t")
    }
    // narrow width must actually exercise the collision path
    assert(vocab.exists(t => est(t) > truth.getOrElse(t, 0L)))
    docs.unpersist()
  }

  test("countMinSketch merges by cell-wise addition across shards") {
    val a = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val b = Seq((3L, "x z z")).toDF("doc_id", "text")
    val merged = HeavyHitters.countMinSketch(a.unionByName(b), "text", 4, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val summed = (HeavyHitters.countMinSketch(a, "text", 4, 32).collect() ++
      HeavyHitters.countMinSketch(b, "text", 4, 32).collect())
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged === summed)
  }

  test("hllDistinct equals the exact Scala register replay") {
    val rows = (0 until 300).map(i => (s"src${i % 3}", s"tok${i % 97}"))
      .toDF("source", "v")
    val got = HeavyHitters.hllDistinct(rows, Seq("source"), "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    def replay(values: Set[String]): (Long, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val regs = values.toSeq
        .map { v =>
          val h = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
          val reg = Integer.parseInt(h.substring(0, 1), 16)
          val v60 = java.lang.Long.parseLong(h.substring(1, 16), 16)
          val rho = if (v60 == 0L) 61
            else 61 - java.lang.Long.toBinaryString(v60).length
          (reg, rho)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val m = 16.0
      val s = regs.values.map(r => BigInt(1) << (61 - r)).sum +
        BigInt(16 - regs.size) * (BigInt(1) << 61)
      val raw = 0.673 * 256.0 * 2305843009213693952.0 / s.toDouble
      val est = if (raw <= 40.0 && regs.size < 16)
        m * math.log(m / (16 - regs.size)) else raw
      (regs.size.toLong, math.round(est * 1e6))
    }
    (0 until 3).foreach { g =>
      val mine = (0 until 300).filter(i => i % 3 == g).map(i => s"tok${i % 97}").toSet
      val (nr, est) = replay(mine)
      assert(got(s"src$g") === ((nr, est)), s"group src$g")
    }
  }

  test("hllDistinct register count is bounded by 16 and nulls are skipped") {
    val rows = Seq(("a", "x"), ("a", null), ("b", null))
      .toDF("source", "v")
    val got = HeavyHitters.hllDistinct(rows, Seq("source"), "v").collect()
    assert(got.length === 1 && got.head.getString(0) === "a")
    assert(got.head.getLong(1) >= 1L && got.head.getLong(1) <= 16L)
  }

  test("heavyHitters refuses when the error bound voids completeness") {
    val docs = (0 until 200).map(i => (i.toLong, s"x$i common"))
      .toDF("doc_id", "text")
    // capacity 2 over 201 distinct tokens -> err > 0; threshold 1 <= err is
    // unprovable, the operator must refuse rather than silently drop tokens.
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(docs, "text", threshold = 1L, capacity = 2)
    }
    assert(e.getMessage.contains("raise capacity"))
  }
}
