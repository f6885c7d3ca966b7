package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class TextOpsSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dedupLinesWithinDoc keeps first occurrences in order, zero shuffle") {
    val df = Seq(
      (0L, "a\nb\na\nc\nb\na"),
      (1L, "x"),
      (2L, "\n\nq\n\nq"), // empty lines dedup like any line
      (3L, "")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.dedupLinesWithinDoc(col("text")).as("c"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(0L -> "a\nb\nc", 1L -> "x", 2L -> "\nq", 3L -> ""))
  }

  test("tokenRarityScore: rare tokens score high, common low, tokenless null") {
    // 'common' appears 20x, 'rare' once -> vocab ranks common 0, rare high
    val docs = ((0 until 20).map(i => (i.toLong, "common")) :+ (20L, "rare") :+
      (21L, "  ")).toDF("id", "text")
    val out = TextAnalysis.tokenRarityScore(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(0L) === Some(0L))     // most frequent -> permille 0
    assert(out(20L) === Some(1000L)) // rarest of 2 vocab entries -> 1000
    assert(out(21L) === None)        // whitespace-only doc
  }

  test("hashEmbed matches a brute-force md5 fold and is layout-invariant") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    }
    def brute(text: String, dim: Int): Seq[Long] = {
      val acc = Array.fill(dim)(0L)
      graft.functions.TokenHashing.tokens(text).foreach { t =>
        val h = md5hex(t)
        val bucket = (java.lang.Long.parseLong(h.substring(0, 8), 16) % dim).toInt
        val sign = if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L
        acc(bucket) += sign
      }
      acc.toSeq
    }
    val texts = Seq("the quick brown fox", "a a a b", "", "one")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"), Similarity.hashEmbed(col("text"), 16).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === brute(t, 16), s"text='$t'")
    }
    val re = df.repartition(5)
      .select(col("id"), Similarity.hashEmbed(col("text"), 16).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(re === got)
  }
}
