package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class BucketedJoinSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join with no exchange on either side; rows equal plain join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed_spec").toString
    val left = (0L until 400L).map(i => (i % 50, i)).toDF("k", "lv")
    val right = (0L until 120L).map(i => (i % 50, s"r$i")).toDF("k", "rv")
    left.write.format("parquet").bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/l").saveAsTable("spec_bucket_l")
    right.withColumnRenamed("k", "k2")
      .write.format("parquet").bucketBy(4, "k2").sortBy("k2")
      .option("path", s"$dir/r").saveAsTable("spec_bucket_r")
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1") // force the shuffle-join planner path
      val joined = spark.table("spec_bucket_l")
        .join(spark.table("spec_bucket_r"), col("k") === col("k2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must read pre-partitioned buckets, no shuffle:\n$plan")
      val got = joined.select("k", "lv", "rv")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val plain = left.join(right.withColumnRenamed("k", "k2"), col("k") === col("k2"))
        .select("k", "lv", "rv")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(got === plain)
    } finally {
      spark.conf.set(thresholdKey, prev)
      spark.sql("DROP TABLE IF EXISTS spec_bucket_l")
      spark.sql("DROP TABLE IF EXISTS spec_bucket_r")
    }
  }
}
