package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

/**
 * Quality gate for the SimHash near-dup path (q26), which has no SQL oracle
 * (hamming over an internal hash seed isn't SQL-expressible). Two spec-level
 * bars instead:
 *
 *  1. Recall floor: every oracle-verified exact token-set duplicate pair
 *     (the q36 query, hash-matched against DuckDB) has identical sketches,
 *     so it MUST appear in the hamming ≤ 3 output. Checked on the real
 *     sf0.001 documents table.
 *  2. Metric sanity: planting k token replacements into a fixed document
 *     moves the sketch monotonically — mean hamming over many variants is
 *     non-decreasing in k, zero at k = 0, and clearly separates light from
 *     heavy edits. Everything is seed-fixed, so the assertion is
 *     deterministic.
 */
class SimHashQualitySuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact-dup pairs (q36 oracle set) are a subset of hamming<=3 pairs (q26)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.simHashExactDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val near = Dedup.simHashDedupPairs(docs, "doc_id", "text", 3)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain exact duplicates")
    val missed = exact -- near
    assert(missed.isEmpty, s"exact dups missing from near-dup output: ${missed.take(5)}")
  }

  test("planted token edits: mean hamming is monotone in edit size") {
    val width = 64
    val baseTokens = (0 until width).map(i => s"tok$i")
    val ks = Seq(0, 1, 2, 4, 8, 16, 32)
    val variantsPerK = 20
    val rnd = new scala.util.Random(42)
    val rows = for {
      k <- ks
      v <- 0 until variantsPerK
    } yield {
      val replaced = rnd.shuffle(baseTokens.indices.toList).take(k).toSet
      val text = baseTokens.indices.map { i =>
        if (replaced(i)) s"rep${k}_${v}_$i" else baseTokens(i)
      }.mkString(" ")
      (k, text)
    }
    val base = Seq(baseTokens.mkString(" ")).toDF("text")
      .select(Dedup.simHash(col("text")).as("sim")).head().getLong(0)
    val means = rows.toDF("k", "text")
      .select(col("k"), bit_count(Dedup.simHash(col("text")).bitwiseXOR(lit(base))).as("h"))
      .groupBy("k").agg(avg("h").as("mh"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(means(0) === 0.0, "k=0 variants are the base document itself")
    ks.sliding(2).foreach { case Seq(a, b) =>
      assert(means(a) <= means(b) + 0.5,
        s"mean hamming not monotone: k=$a -> ${means(a)}, k=$b -> ${means(b)}")
    }
    assert(means(32) > means(1) + 5.0,
      s"heavy edits should separate clearly from light ones: ${means.toSeq.sortBy(_._1)}")
  }
}
