package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.SketchFunctions

/** Scratch probe (manual, not a suite): per-stage timing of the CLASSIC
  * banded-membership minhash pipeline at a given sf dir — the r15-era
  * shape this probe was built to diagnose (it located the super-linear
  * token-set shuffle the r16 component redesign removed). Kept for
  * banding-volume forensics; the live operator's stages are measured by
  * [[MinHashShuffleProbe]]. */
object MinHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def time[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"PROBE $dir $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val n = time("count")(docs.count())
      // stage 1: tokenization + signatures only
      val base = docs.select(col("doc_id").cast("long").as("id"),
          Dedup.hashedNgramSet(col("text"), 1).as("toks"))
        .select(col("id"), col("toks"),
          SketchFunctions.minhash_signature(col("toks"), 128).as("sig"))
      time("signatures")(
        base.select(max(element_at(col("sig"), 1))).head())
      // stage 2: banding + bucket grouping + candidate emission
      val bucketsOf = SketchFunctions.minhash_band_hashes(col("sig"), 32)
      val banded = base
        .select(posexplode(bucketsOf).as(Seq("band", "bucket")),
          col("id"), bucketsOf.as("bs"))
        .repartition(32, col("band"), col("bucket"))
      val nBand = time("band_rows")(banded.count())
      // Sigma m(m-1)/2 over (band, bucket) occupancies — the upper bound
      // on bucket-stage comparisons, as ONE row to the driver.
      val vol = time("pair_volume") {
        base.select(posexplode(bucketsOf).as(Seq("band", "bucket")))
          .groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("m"))
          .agg(coalesce(sum(expr("m * (m - 1) div 2")), lit(0L)))
          .head().getLong(0)
      }
      println(s"PROBE $dir n=$n bandRows=$nBand vol=$vol")
    }
    spark.stop()
  }
}
