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
    // first timed query doesn't absorb JVM startup. Exceptions are swallowed
    // HERE ONLY because this pass isn't a gate — a query broken by a code
    // change still surfaces in the timed passes below as -1.
    SparkEntry.queries.foreach { case (_, fn) =>
      try sink(fn(spark, sfDir)) catch { case _: Throwable => () }
      dropLeakedBlocks()
    }
    // Two timed passes, min per query: a single pass is hostage to host
    // contention on a shared machine (round-6 driver numbers showed 2-3x
    // one-off inflation on individual queries); the min of two runs is the
    // cleanest estimate of the plan's cost. A failed query reports -1.
    def timedPass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { sink(fn(spark, sfDir)); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      dropLeakedBlocks()
      name -> (if (ok) dt else -1.0)
    }
    val p1 = timedPass()
    val p2 = timedPass()
    // Min of the passes that SUCCEEDED: one transient failure (host OOM in
    // a single pass) doesn't void a valid measurement from the other.
    val results = p1.map { case (name, v1) =>
      val v2 = p2(name)
      val ok = Seq(v1, v2).filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Failed queries are EXCLUDED from the total and listed: summing their
    // -1 sentinel would make a broken query look like a speedup.
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.values.filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir","note":"toRdd sink + untimed warmup + per-query leaked-block cleanup + min of 2 timed passes, failures excluded from total (r7); totals not comparable to r1/r2 count()-sink numbers"}"""
    // stdout first — it must survive even if the file write fails. The
    // on-disk copy exists because the driver's stdout tail truncated round
    // 6's capture mid-JSON; losing BOTH to a full /tmp would be worse.
    println(json)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_bench.json"),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"bench: could not write /tmp/graft_bench.json: $e")
    }
    spark.stop()
  }
}
