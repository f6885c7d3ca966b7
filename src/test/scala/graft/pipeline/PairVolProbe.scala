package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch scaling probe (run manually, not a suite): measures the
  * REALIZED SemDeDup within-cluster pair volume Σ nc(nc−1)/2 under
  * auto-k at each given sf dir — the SCALING.md pair-volume row. Uses
  * the OPERATOR's own trainer routing (flat Lloyd ≤ 2048 clusters,
  * two-level hierarchy past it), so the probe measures the assignment
  * a real run would produce at that scale. */
object PairVolProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val k = Similarity.semDeDupParams(n)
      val sizes = Similarity.clusterAssignForDedup(emb, "vec_id",
          "embedding", k, iters = 3, seed = "km", flatKMax = 2048)
        .groupBy(col("cluster")).agg(count(lit(1)).as("n")).collect()
      val pairVol = sizes.iterator
        .map { r => val c = r.getLong(1); c * (c - 1) / 2 }.sum
      val maxC = sizes.map(_.getLong(1)).max
      println(s"""PAIRVOL {"dir":"$dir","n":$n,"k":$k,"pairVol":$pairVol,"maxCluster":$maxC}""")
    }
    spark.stop()
  }
}
