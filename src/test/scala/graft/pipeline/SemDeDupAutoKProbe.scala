package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (manual, not a suite): the incremental-SemDeDup decade
  * measurement at the PRODUCTION model shape — the round-16 verdict's
  * missing row. q248's gate pins a kc=3·kf=3 toy model so its oracle
  * stays replayable, which at sf100 funnels 2M vectors into 9 clusters
  * and (correctly) trips maxPairBudget; this probe instead derives k via
  * [[Similarity.semDeDupParams]] auto-k (target cluster size 64, the
  * q208 convention), fits the two-level model at kc=kf=⌈√k⌉, builds the
  * survivor index through the frozen model, and probes a fresh batch —
  * timing build and probe separately, so the decade row measures the
  * lifecycle a 100-TB pipeline actually runs (build once, probe per
  * ingest).
  *
  * Usage: Test/runMain graft.pipeline.SemDeDupAutoKProbe <sfDir>
  */
object SemDeDupAutoKProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: SemDeDupAutoKProbe <sfDir>")
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val k = Similarity.semDeDupParams(n, targetClusterSize = 64)
    val kc = math.ceil(math.sqrt(k.toDouble)).toInt
    val kf = (k + kc - 1) / kc
    println(s"PROBE n=$n autoK=$k kc=$kc kf=$kf")

    val t0 = System.nanoTime()
    val (coarse, fine) = Similarity.kmeansTwoLevelModel(
      emb, "vec_id", "embedding", kCoarse = kc, kFine = kf,
      itersCoarse = 2, itersFine = 2)
    val fineRows = fine.localCheckpoint(eager = true)
    val tFit = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val index = Similarity.semDeDupIndexFromModel(
        emb, "vec_id", "embedding", coarse, fineRows, kFine = kf,
        threshold = 0.42)
      .localCheckpoint(eager = true)
    val nIdx = index.count()
    val tBuild = (System.nanoTime() - t1) / 1e9

    val batch = emb.select((col("vec_id") + 100000000L).as("vec_id"),
      when(col("vec_id") % 2 === 0, col("embedding"))
        .otherwise(reverse(col("embedding"))).as("embedding"))
    val t2 = System.nanoTime()
    val pairs = Similarity.semDeDupPairsAgainstIndex(batch, "vec_id",
      "embedding", coarse, fineRows, kFine = kf, index, threshold = 0.42)
    val nPairs = pairs.count()
    val tProbe = (System.nanoTime() - t2) / 1e9

    println(f"""{"probe":"semdedup_autok","sf_dir":"$sfDir","n":$n,""" +
      f""""k":$k,"kc":$kc,"kf":$kf,"fit_sec":$tFit%.2f,""" +
      f""""index_build_sec":$tBuild%.2f,"index_rows":$nIdx,""" +
      f""""probe_sec":$tProbe%.2f,"pairs":$nPairs}""")
    spark.stop()
  }
}
