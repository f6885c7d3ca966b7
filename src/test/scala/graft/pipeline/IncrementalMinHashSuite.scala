package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class IncrementalMinHashSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("probe against a stored index equals the cross-subset of the full pair run") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (3L, "completely different words entirely here now"),
      (4L, "completely different words entirely here too"), // near-dup of 3
      (5L, "yet another unrelated document about trains")
    ).toDF("doc_id", "text")
    val index = Dedup.minHashIndex(docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
    val incr = Dedup.minHashPairsAgainstIndex(
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text", index, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minHashDedupPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossOnly = full.collect {
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (b, a)
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
    }
    assert(incr === crossOnly)
    assert(incr.contains((1L, 0L)) && incr.contains((1L, 2L))) // true cross pairs found
  }

  test("IVF: persisted index serves identical top-k to the one-shot path") {
    val vecs = spark.range(0, 200)
      .selectExpr("id AS vec_id",
        "transform(sequence(0, 7), i -> CAST((id * (i + 3)) % 13 AS FLOAT)) AS embedding")
    val queries = vecs.where(col("vec_id") < 5)
    val oneShot = Similarity.ivfTopK(queries, vecs, "vec_id", "vec_id",
        "embedding", 4, nlist = 8, nprobe = 3, replicas = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", dir, nlist = 8, replicas = 2)
    val fromIndex = Similarity.ivfTopKFromIndex(spark, dir, queries,
        "vec_id", "embedding", 4, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fromIndex === oneShot && oneShot.nonEmpty)
  }

  test("IVF delete + frozen-centroid ingest equals from-scratch survivor assignment") {
    val vecs = spark.range(0, 200)
      .selectExpr("id AS vec_id",
        "transform(sequence(0, 7), i -> CAST((id * (i + 3)) % 13 AS FLOAT)) AS embedding")
    val root = java.nio.file.Files.createTempDirectory("ivf_life").toString
    // base generation: even ids only
    Similarity.buildIvfIndex(vecs.where(col("vec_id") % 2 === 0),
      "vec_id", "embedding", s"$root/base", nlist = 8, replicas = 3)
    // lifecycle: retire ids % 4 == 0 (compaction), ingest the odd batch
    // through the STORED centroids
    Similarity.compactIvfIndex(spark, s"$root/base", s"$root/gen2",
      vecs.where(col("vec_id") % 4 === 0).select("vec_id"), "vec_id")
    Similarity.updateIvfIndex(spark, s"$root/gen2",
      vecs.where(col("vec_id") % 2 === 1), "vec_id", "embedding", replicas = 3)
    // retired ids are gone; survivors carry 3 distinct cells each
    val cells = spark.read.parquet(s"$root/gen2/cells")
    assert(cells.where(col("c_id") % 4 === 0).count() === 0)
    val perId = cells.groupBy("c_id")
      .agg(countDistinct(col("cell")).as("nc")).collect()
    assert(perId.length === 150) // 50 even survivors + 100 odd ingested
    assert(perId.forall(_.getLong(1) === 3L))
    // from-scratch: empty the postings, assign ALL survivors fresh through
    // the same frozen centroids — probes must match the lifecycle index
    Similarity.compactIvfIndex(spark, s"$root/base", s"$root/scratch",
      vecs.select("vec_id"), "vec_id")
    Similarity.updateIvfIndex(spark, s"$root/scratch",
      vecs.where(col("vec_id") % 4 =!= 0), "vec_id", "embedding", replicas = 3)
    val queries = vecs.where(col("vec_id") < 5)
    def probe(path: String) =
      Similarity.ivfTopKFromIndex(spark, path, queries, "vec_id",
          "embedding", 4, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val lifecycle = probe(s"$root/gen2")
    assert(lifecycle === probe(s"$root/scratch") && lifecycle.nonEmpty)
  }

  test("IVF compaction with refresh recenters cells on their survivors") {
    val vecs = spark.range(0, 200)
      .selectExpr("id AS vec_id",
        "transform(sequence(0, 7), i -> CAST((id * (i + 3)) % 13 AS FLOAT)) AS embedding")
    val root = java.nio.file.Files.createTempDirectory("ivf_refresh").toString
    Similarity.buildIvfIndex(vecs.where(col("vec_id") % 2 === 0),
      "vec_id", "embedding", s"$root/base", nlist = 8, replicas = 3)
    Similarity.compactIvfIndex(spark, s"$root/base", s"$root/gen2",
      vecs.where(col("vec_id") % 4 === 0).select("vec_id"), "vec_id",
      refreshCentroids = true)
    // postings: identical to the frozen-centroid compaction (cells are
    // stored history; only the routing table moves)
    val cells = spark.read.parquet(s"$root/gen2/cells")
    assert(cells.where(col("c_id") % 4 === 0).count() === 0)
    assert(cells.select("c_id").distinct().count() === 50)
    // every cell's refreshed centroid equals the integer-micro mean of
    // its surviving members (empty cells carry the old centroid)
    val surv = cells.collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val oldC = spark.read.parquet(s"$root/base/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toMap
    val newC = spark.read.parquet(s"$root/gen2/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toMap
    assert(newC.keySet === oldC.keySet)
    newC.foreach { case (cell, cv) =>
      surv.get(cell) match {
        case Some(ms) =>
          val want = (0 until 8).map { d =>
            val micro = ms.map(v => math.round(v(d) * 1e6))
            math.floorDiv(micro.sum, micro.length.toLong) / 1e6
          }
          assert(cv.toSeq === want.toSeq, s"cell $cell centroid drifted")
        case None => assert(cv.toSeq === oldC(cell).toSeq)
      }
    }
    // and the refreshed routing changes later assignment: at least one
    // centroid actually moved (the data is not already centered)
    assert(oldC.exists { case (c, v) => newC(c).toSeq != v.toSeq })
  }

  test("index survives a parquet roundtrip and probes identically") {
    val docs = (0L until 60L).map(i => (i, s"shared body text variant ${i % 9}"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mh_idx").toString + "/idx"
    Dedup.minHashIndex(docs.where(col("doc_id") < 30), "doc_id", "text")
      .write.parquet(dir)
    val direct = Dedup.minHashPairsAgainstIndex(
        docs.where(col("doc_id") >= 30), "doc_id", "text",
        Dedup.minHashIndex(docs.where(col("doc_id") < 30), "doc_id", "text"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDisk = Dedup.minHashPairsAgainstIndex(
        docs.where(col("doc_id") >= 30), "doc_id", "text",
        spark.read.parquet(dir), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDisk === direct && direct.nonEmpty)
  }
}
