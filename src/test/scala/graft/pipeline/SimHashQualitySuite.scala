package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

/**
 * Quality gate for the SimHash near-dup path (q26). The md5 token-hash
 * family is additionally hash-checked end-to-end by the driver's DuckDB
 * oracle (round 8); the xxh64 default and the 128-bit width are gated here:
 *
 *  1. Recall floor: every oracle-verified exact token-set duplicate pair
 *     (the q36 query, hash-matched against DuckDB) has identical sketches,
 *     so it MUST appear in the hamming ≤ 3 output — at every width and
 *     hash family. Checked on the real sf0.001 documents table.
 *  2. Metric sanity: planting k token replacements into a fixed document
 *     moves the sketch monotonically — mean hamming over many variants is
 *     non-decreasing in k, zero at k = 0, and clearly separates light from
 *     heavy edits. Everything is seed-fixed, so the assertion is
 *     deterministic.
 *  3. Width consistency: word 0 of each 128-bit sketch is bit-identical to
 *     the 64-bit sketch of the same text (both families), so widening the
 *     sketch can only split 64-bit collisions, never lose true duplicates.
 */
class SimHashQualitySuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact-dup pairs (q36 oracle set) are a subset of hamming<=3 pairs (q26)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.simHashExactDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain exact duplicates")
    // Every width × hash family must clear the same recall floor: identical
    // token sets mean identical sketches at any width, so the radius bound
    // never matters for exact dups.
    for {
      bits <- Seq(64, 128)
      family <- Seq("xxh64", "md5")
    } {
      val maxH = if (bits == 128) 7 else 3
      val near = Dedup.simHashDedupPairs(docs, "doc_id", "text", maxH, bits, family)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val missed = exact -- near
      assert(missed.isEmpty,
        s"exact dups missing from $bits-bit $family near-dup output: ${missed.take(5)}")
    }
  }

  test("128-bit sketch word 0 equals the 64-bit sketch; radius bounds enforced") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(200)
    val both = docs.select(
        Dedup.simHash(col("text")).as("s64"),
        graft.functions.SketchFunctions.simhash128(
          Dedup.hashedNgramSet(col("text"), 1)).getItem(0).as("s128w0"),
        graft.functions.TextHashFunctions.md5_token_simhash64(col("text")).as("m64"),
        graft.functions.TextHashFunctions.md5_token_simhash128(col("text")).getItem(0).as("m128w0"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), "xxh64: 128-bit word0 != 64-bit sketch")
      assert(r.getLong(2) === r.getLong(3), "md5: 128-bit word0 != 64-bit sketch")
    }
    intercept[IllegalArgumentException] {
      Dedup.simHashDedupPairs(docs, "doc_id", "text", 4, 64)
    }
    intercept[IllegalArgumentException] {
      Dedup.simHashDedupPairs(docs, "doc_id", "text", 8, 128)
    }
    intercept[IllegalArgumentException] {
      Dedup.simHashDedupPairs(docs, "doc_id", "text", 3, 96)
    }
  }

  test("128-bit pairs at radius<=3 are a subset of 64-bit pairs (projection property)") {
    // hamming128(a,b) >= hamming64(word0(a), word0(b)), so any pair within
    // radius r at 128 bits is within r at 64 bits. The reverse direction is
    // where the width buys collision-splitting.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(bits: Int) =
      Dedup.simHashDedupPairs(docs, "doc_id", "text", 3, bits)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p128 = pairs(128)
    val p64 = pairs(64)
    assert(p128.nonEmpty, "128-bit output should be non-empty on the fixture")
    assert((p128 -- p64).isEmpty, "128-bit radius-3 pair absent from 64-bit output")
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
  test("null-text documents never pair, at every width and hash family") {
    // array(null) is a NON-null single-element array: the 64-bit arms wrap
    // the scalar sketch, so a naive isNotNull filter would let null-text
    // docs collapse into one hamming-0 group and emit as false duplicates.
    val docs = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String]),
      (3L, "some actual text content here"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    for {
      bits <- Seq(64, 128)
      fam <- Seq("xxh64", "md5")
    } {
      val pairs = Dedup.simHashDedupPairs(docs, "doc_id", "text",
        maxHamming = 3, bits = bits, tokenHash = fam).collect()
      assert(pairs.isEmpty, s"bits=$bits fam=$fam emitted null-text pairs: ${pairs.toSeq}")
    }
  }
}
