package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch probe (manual, not a suite): end-to-end q24 minhash run at a
  * given sf dir with TOTAL SHUFFLE BYTES measured via a stage listener —
  * the round-16 done-criterion instrument (bucket-stage payload cut vs
  * the r15 design is graded in measured shuffle-write bytes, not argued).
  */
object MinHashShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val written = new AtomicLong(0L)
    val read = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          val si = sc.stageInfo
          val dur = (for {s <- si.submissionTime; e <- si.completionTime}
            yield (e - s) / 1000.0).getOrElse(-1.0)
          if (dur > sys.env.getOrElse("PROBE_STAGE_MIN", "3.0").toDouble) {
            println(f"STAGE id=${si.stageId} tasks=${si.numTasks} " +
              f"dur=$dur%.1f s cpu=${m.executorCpuTime / 1e9}%.0f s " +
              f"wMB=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0f " +
              f"rMB=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0f " +
              f"spillMB=${m.diskBytesSpilled / 1e6}%.0f :: ${si.name}")
          }
        }
      }
    })

    args.foreach { dir =>
      written.set(0L); read.set(0L)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val pairs = Dedup.minHashDedupPairs(docs, "doc_id", "text", 0.9).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(2000)
      println(f"SHUFPROBE dir=$dir pairs=$pairs%d secs=$secs%.1f " +
        f"shuffleWriteMB=${written.get() / 1e6}%.0f " +
        f"shuffleReadMB=${read.get() / 1e6}%.0f")
    }
    spark.stop()
  }
}
