package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (manual, not a suite): [[SemDeDupAutoKProbe]] with the
  * round-18 BOUNDED fit — the answer to the fit wall that probe
  * measured (14.8 → 106.3 → 1544 s per decade; auto-k makes the
  * full-corpus Lloyd pass n^1.5-shaped). Same auto-k (derived from the
  * FULL corpus count), same index build and probe batch, but the
  * two-level trainer reads only the deterministic
  * [[Similarity.fitSample]] slice (default 65,536 rows — k=31,250 at
  * the 2M-vector decade still seeds inside it), so fit cost is
  * k·maxFitRows per iteration instead of k·n. The printed pairs count
  * lands next to the full-fit capture's (510,722 at sf100 in
  * bench/scaling_r17_autok.json) — the quality trade of sampling the
  * fit is measured, not guessed.
  *
  * Usage: Test/runMain graft.pipeline.SemDeDupSampledFitProbe <sfDir> [maxFitRows]
  */
object SemDeDupSampledFitProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1,
      "usage: SemDeDupSampledFitProbe <sfDir> [maxFitRows]")
    val sfDir = args(0)
    val maxFitRows = if (args.length >= 2) args(1).toLong else 65536L
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
    println(s"PROBE n=$n autoK=$k kc=$kc kf=$kf maxFitRows=$maxFitRows")

    val t0 = System.nanoTime()
    val (coarse, fine) = Similarity.kmeansTwoLevelModelSampled(
      emb, "vec_id", "embedding", kCoarse = kc, kFine = kf,
      itersCoarse = 2, itersFine = 2, maxFitRows = maxFitRows)
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

    println(f"""{"probe":"semdedup_autok_sampled","sf_dir":"$sfDir",""" +
      f""""n":$n,"k":$k,"kc":$kc,"kf":$kf,"max_fit_rows":$maxFitRows,""" +
      f""""fit_sec":$tFit%.2f,"index_build_sec":$tBuild%.2f,""" +
      f""""index_rows":$nIdx,"probe_sec":$tProbe%.2f,"pairs":$nPairs}""")
    spark.stop()
  }
}
