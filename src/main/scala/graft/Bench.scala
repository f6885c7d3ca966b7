package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  /**
   * Forces full materialization of every projected column: counting the
   * physical plan's InternalRow RDD executes the plan as optimized for the
   * query's own output, unlike `df.count()` which lets Catalyst prune all
   * projected expressions and time little more than the scan.
   */
  private def sink(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Iterative operators localCheckpoint intermediates; those blocks are
    // reaped only when the GC collects the RDD handles, so a 100-query run
    // accumulates dead blocks that inflate later queries (GC pressure, block
    // manager scans). Nothing here is reused across queries — every timed
    // query plans from scratch — so dropping all persisted RDDs between
    // queries (outside the timed window) keeps each measurement clean.
    def dropLeakedBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // Untimed warmup pass: JIT + codegen caches + shuffle service init, so the
    // first timed query doesn't absorb JVM startup.
    SparkEntry.queries.foreach { case (_, fn) =>
      try sink(fn(spark, sfDir)) catch { case _: Throwable => () }
      dropLeakedBlocks()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try sink(fn(spark, sfDir)) catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      dropLeakedBlocks()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","note":"toRdd sink + untimed warmup + per-query leaked-block cleanup (r6); totals not comparable to r1/r2 count()-sink numbers"}""")
    spark.stop()
  }
}
