package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KmvFunctions, KmvSet}
import graft.xml.SparkTestSession

class KmvLifecycleSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("KmvSet: bytes roundtrip, add keeps k smallest distinct, estimate exact below k") {
    val rnd = new Random(3)
    val buf = scala.collection.mutable.TreeSet.empty[Long]
    val vals = Seq.fill(500)(rnd.nextLong().abs % (1L << 60))
    vals.foreach(KmvSet.add(buf, _, 32))
    assert(buf.size === 32)
    assert(buf.toSeq === vals.distinct.sorted.take(32))
    assert(KmvSet.fromBytes(KmvSet.toBytes(buf)).toSeq === buf.toSeq)
    val small = scala.collection.mutable.TreeSet(1L, 5L, 9L)
    assert(KmvSet.estimate(small, 32) === 3L)
  }

  test("sketch -> merge -> estimate equals the one-shot aggregate, any split") {
    val rnd = new Random(11)
    val rows = (0 until 3000).map { i =>
      (s"g${i % 3}", s"shard${rnd.nextInt(7)}", s"v${rnd.nextInt(400)}")
    }.toDF("grp", "shard", "v")
    val h = KmvFunctions.md5Hash60(col("v"))
    val direct = rows.groupBy("grp")
      .agg(KmvFunctions.kmv_distinct(h, 64).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaLedger = rows.groupBy("grp", "shard")
      .agg(KmvFunctions.kmv_sketch(h, 64).as("sk"))
      .groupBy("grp")
      .agg(KmvFunctions.kmv_estimate(KmvFunctions.kmv_merge(col("sk"), 64), 64).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaLedger === direct)
    // and the serialized sketches survive a parquet roundtrip verbatim
    val dir = java.nio.file.Files.createTempDirectory("kmv").toString + "/ledger"
    rows.groupBy("grp", "shard")
      .agg(KmvFunctions.kmv_sketch(h, 64).as("sk"))
      .write.parquet(dir)
    val back = spark.read.parquet(dir).groupBy("grp")
      .agg(KmvFunctions.kmv_estimate(KmvFunctions.kmv_merge(col("sk"), 64), 64).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back === direct)
  }
}
