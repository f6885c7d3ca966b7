package graft.pipeline

import org.apache.spark.sql.functions._
import graft.xml.SparkTestSession

/** Scratch tuning drive — delete after use. */
object TuneDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = Similarity.bruteForceNearPairs(emb, "vec_id", "embedding", 0.42)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((pl, tb) <- Seq((6, 64), (5, 48), (5, 64))) {
        val lsh = Similarity.lshNearPairs(emb, "vec_id", "embedding", 64, 0.42, pl, tb)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[$sf] lsh planes=$pl tables=$tb exact=${exact.size} missed=${(exact -- lsh).size}")
      }

      val q = emb.filter(col("vec_id") < 10)
      val ex = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((nl, np) <- Seq((32, 8), (32, 12), (16, 4), (16, 6), (16, 8))) {
        val ivf = Similarity.ivfTopK(q, emb, "vec_id", "vec_id", "embedding", 5, nl, np)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[$sf] ivf nlist=$nl nprobe=$np setrecall=${(ex intersect ivf).size}/${ex.size}")
      }
    }
    spark.stop()
  }
}
