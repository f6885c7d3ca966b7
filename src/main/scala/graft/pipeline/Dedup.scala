package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, each designed around
 * Spark's shuffle model:
 *
 *  - exact dedup: one hash-shuffle on the content digest
 *  - MinHash LSH: map-side signatures → band explode → equi-join on
 *    (band, bucket) — candidate generation never goes quadratic, and the
 *    equi-join shuffle is AQE-skew-splittable
 *  - SimHash: map-side 64-bit sketch → pigeonhole chunk join for small
 *    Hamming radii
 *  - n-gram Jaccard: exact verification join, meant to run on LSH candidates
 *    or within a blocking key
 *
 * All operators are built from codegen'd built-in functions; signatures are
 * computed in a single map pass (no shuffle) so the only wide stages are the
 * candidate joins on compact keys.
 */
object Dedup {

  /** Distinct word tokens of a text column. */
  def tokenSet(text: Column): Column =
    array_distinct(TextAnalysis.tokens(text))

  /** Exact-duplicate groups keyed by md5 of raw text; keeps min(id) as representative. */
  def exactRepresentatives(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(to_binary(col(textCol), lit("utf-8"))).as("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Exact dedup: one row per distinct text (the min-id representative row). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(to_binary(col(textCol), lit("utf-8"))))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * MinHash signature (length `numHashes`) over the distinct-token set.
   * The i-th hash function is xxhash64 re-keyed by the seed index — an
   * independent-enough family with no arithmetic that can overflow under
   * ANSI mode. Single map pass, no shuffle.
   */
  def minHashSignature(text: Column, numHashes: Int): Column = {
    val hashes = transform(tokenSet(text), t => xxhash64(t))
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(hashes, h => xxhash64(i, h))))
  }

  /**
   * LSH band buckets for a signature: `bands` rows of (band index, bucket
   * hash of the band's slice). hamming-style banding: two documents collide
   * in some band iff their signatures agree on that band's `r` positions.
   */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      i => struct(i.as("band"), xxhash64(slice(sig, i * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))

  /**
   * Near-duplicate pairs by MinHash LSH with exact Jaccard verification.
   * Returns (id_a, id_b, jaccard) for all pairs with token-set Jaccard ≥
   * `threshold`. With the default 128 hashes / 32 bands × 4 rows, the
   * probability of missing a pair at 0.8 similarity is ~5e-8, so the output
   * matches an exact all-pairs oracle in practice while doing
   * candidate-generation work proportional to collisions, not n².
   */
  def minHashDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    val r = numHashes / bands
    val base = df.select(
      col(idCol).as("id"),
      tokenSet(col(textCol)).as("toks"),
      minHashSignature(col(textCol), numHashes).as("sig"))

    val banded = base
      .select(col("id"), explode(lshBands(col("sig"), bands, r)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val candidates = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    val toks = base.select(col("id"), col("toks"))
    candidates
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("uni", size(array_union(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over the distinct-token set (bit-vote sketch); map-side only. */
  def simHash(text: Column): Column = {
    val hashes = transform(tokenSet(text), t => xxhash64(t))
    // votes(j) > 0 → bit j set.
    val votes = transform(sequence(lit(0), lit(63)), j =>
      aggregate(hashes, lit(0), (acc, x) =>
        acc + when((shiftrightunsigned_col(x, j) bitwiseAND lit(1L)) === 1L, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, j) =>
        when(v > 0, shiftleft_col(lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc bitwiseOR x)
  }

  // shiftright/shiftleft with Column shift amounts exist only in SQL; wrap them.
  private def shiftrightunsigned_col(v: Column, amount: Column): Column =
    call_function("shiftrightunsigned", v, amount)
  private def shiftleft_col(v: Column, amount: Column): Column =
    call_function("shiftleft", v, amount)

  /** The 4×16-bit chunks of a 64-bit sketch, for pigeonhole candidate joins. */
  def simHashChunks(sim: Column): Column =
    transform(sequence(lit(0), lit(3)), i =>
      struct(i.as("chunk"),
        (shiftrightunsigned_col(sim, i * 16) bitwiseAND lit(0xffffL)).as("val")))

  /**
   * Near-duplicate pairs by SimHash with Hamming distance ≤ `maxHamming`
   * (≤ 16 supported via 4-chunk pigeonhole: any pair within radius 3 shares
   * at least one exact chunk). Returns (id_a, id_b, hamming).
   */
  def simHashDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole guarantees recall only for radius <= 3")
    val base = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val chunked = base.select(col("id"), col("sim"), explode(simHashChunks(col("sim"))).as("c"))
      .select(col("id"), col("sim"), col("c.chunk").as("chunk"), col("c.val").as("val"))
    chunked.as("l")
      .join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.val") === col("r.val") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sim") bitwiseXOR col("r.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Distinct word n-gram (shingle) set of a text column. */
  def ngramSet(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /**
   * Exact n-gram Jaccard similarity pairs within a blocking key (e.g. source,
   * language, or an LSH bucket). Quadratic only within each block — the
   * standard way to bound exact-verification cost at scale.
   */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    val base = df.select(
      col(blockCol).as("blk"), col(idCol).as("id"), ngramSet(col(textCol), n).as("grams"))
    base.as("l").join(base.as("r"),
        col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .withColumn("inter", size(array_intersect(col("l.grams"), col("r.grams"))))
      .withColumn("uni", size(array_union(col("l.grams"), col("r.grams"))))
      .withColumn("jaccard",
        when(col("uni") === 0, lit(0.0))
          .otherwise(col("inter").cast("double") / col("uni").cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("jaccard"))
  }
}
