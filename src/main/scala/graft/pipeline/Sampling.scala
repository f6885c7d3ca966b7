package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, key-stable sampling and split assignment.
 *
 * A 100-TB training pipeline cannot use `df.sample()` for held-out splits:
 * its output depends on partitioning and run order, so a re-run (or a
 * recomputed lineage after executor loss) silently reassigns rows. These
 * operators derive the decision purely from a stable key — the same row
 * lands in the same split on every run, on any cluster layout, and a
 * document's assignment can be recomputed from its id alone (no membership
 * table to join). Everything is a map-side expression: no shuffle, no state.
 *
 * The bucket function is the low 32 bits of md5 of (key string ++ salt),
 * reduced mod `buckets` — md5 rather than xxhash64 so external systems
 * (and the DuckDB oracle) can replicate the exact assignment.
 */
object Sampling {

  val DefaultBuckets = 1000000

  /** Stable bucket in [0, buckets) from a non-null key. Change `salt` to
   *  draw an independent assignment (e.g. per-epoch subsampling). */
  def hashBucket(key: Column, buckets: Int = DefaultBuckets, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 25, 8), 16, 10)
      .cast("long") % buckets

  /** Keep a deterministic `fraction` of rows, keyed by `keyCol`. */
  def sampleByHash(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(hashBucket(col(keyCol), DefaultBuckets, salt) <
      math.round(fraction * DefaultBuckets))
  }

  /**
   * Assign each row to a named split by cumulative weight ranges over the
   * bucket space — e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`.
   * Weights must sum to 1 (±1e-9); ranges are half-open and exhaustive, so
   * every row gets exactly one split.
   */
  def assignSplits(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "split weights must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = hashBucket(col(keyCol), DefaultBuckets, salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * DefaultBuckets))
    // Last range is `otherwise`, so rounding can never leave a row unassigned.
    val expr = splits.init.zip(bounds.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        val cond = bucket < hi
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }
    val assigned = expr.fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn(splitCol, assigned)
  }
}
