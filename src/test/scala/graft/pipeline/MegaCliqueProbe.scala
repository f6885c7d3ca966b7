package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (manual, not a suite): wall-time A/B of the round-17
  * pair-range sharding on its target shape — ONE giant near-dup
  * component. A planted clique of `n` DISTINCT documents (shared
  * 40-token core + a unique token each, pairwise Jaccard ≈ 0.952)
  * collides in most bands, so component discovery yields a single
  * n-member component and stage 3 must run C(n,2) exact verifications.
  * threshold=0.99 rejects every pair at verify time, isolating the
  * comparison cost from the (identical either way) emission cost.
  * Sharded = default pairBlockSize 4096; serial = one giant block (the
  * pre-r17 single-task-per-component profile).
  *
  * Usage: Test/runMain graft.pipeline.MegaCliqueProbe [n=16384]
  */
object MegaCliqueProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 16384
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val core = (0 until 40).map(i => s"w$i").mkString(" ")
    val clique = spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        concat(lit(core), lit(" u"), col("id").cast("string")).as("text"))
      .localCheckpoint(eager = true)

    def time(label: String, bs: Int): Double = {
      val t0 = System.nanoTime()
      val c = Dedup.minHashDedupPairs(clique, "doc_id", "text", 0.99,
        pairBlockSize = bs).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label: $dt%.1f s (pairs=$c)")
      dt
    }
    time("warmup (sharded)", 4096)
    val sharded = time("sharded bs=4096", 4096)
    val serial = time("serial one-block", Int.MaxValue)
    val sharded2 = time("sharded bs=4096 (2nd)", 4096)
    println(f"""{"probe":"mega_clique","n":$n,""" +
      f""""sharded_sec":${math.min(sharded, sharded2)}%.1f,""" +
      f""""serial_sec":$serial%.1f}""")
    spark.stop()
  }
}
