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
