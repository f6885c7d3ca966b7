package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class ShuffleSkewSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- shuffleOrder ----

  test("shuffleOrder assigns the exact global md5-order ranks") {
    val df = spark.range(0, 300).select(col("id").as("doc_id"))
    val got = Sampling.shuffleOrder(df, "doc_id", "epochX")
      .select("doc_id", "shuffle_pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String = {
      md.reset()
      md.digest(s"epochX|$id".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    }
    val expected = (0L until 300L).sortBy(id => (key(id), id)).zipWithIndex
      .map { case (id, pos) => id -> pos.toLong }.toMap
    assert(got === expected)
    assert(got.values.toSeq.sorted === (0L until 300L)) // a true permutation
  }

  test("shuffleOrder is layout-invariant and salt-sensitive") {
    val df = spark.range(0, 200).select(col("id").as("doc_id"))
    val a = Sampling.shuffleOrder(df, "doc_id", "s1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.shuffleOrder(df.repartition(13), "doc_id", "s1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    val c = Sampling.shuffleOrder(df, "doc_id", "s2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a !== c) // different epoch, different order
  }

  // ---- saltedEquiJoin ----

  test("salted join equals the plain join on skewed keys, row for row") {
    // hot key 7: 500 of 600 left rows; right has duplicate key rows too
    val left = spark.range(0, 600)
      .select(col("id").as("lid"),
        when(col("id") < 500, lit(7L)).otherwise(col("id") % 20).as("k"))
    val right = ((0L until 20L).map(k => (k, s"v$k")) ++ Seq((7L, "v7dup")))
      .toDF("k", "v")
    val salted = Skew.saltedEquiJoin(left, right, "k", "lid", salt = 8)
      .select("lid", "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val plain = left.join(right, Seq("k")).select("lid", "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(salted === plain)
    // 505 left rows hit key 7 (500 planted + ids ≡ 7 mod 20 in 500..599),
    // each matched by 2 right rows.
    assert(plain.count(_._2 == 7L) === 1010)
  }

  test("salt=1 degenerates to the plain join") {
    val left = Seq((1L, 10L), (2L, 20L)).toDF("lid", "k")
    val right = Seq((10L, "a"), (30L, "c")).toDF("k", "v")
    val out = Skew.saltedEquiJoin(left, right, "k", "lid", salt = 1)
      .collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    assert(out === Seq((1L, "a")))
  }
}
