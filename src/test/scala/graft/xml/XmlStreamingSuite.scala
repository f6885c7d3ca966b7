package graft.xml

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming composition: the reference has no streaming surface, but our
 * column-function layer composes with Structured Streaming out of the box —
 * `readStream.text` over an XML-records directory + `from_xml` gives an
 * incremental XML pipeline with watermarks/windows available downstream.
 */
class XmlStreamingSuite extends AnyFunSuite {

  test("readStream.text + from_xml parses XML records incrementally") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("batch1.txt"),
      "<r><k>1</k><v>a</v></r>\n<r><k>2</k><v>b</v></r>\n")

    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val parsed = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(in.toString)
      .select(graft.xml.from_xml(col("value"), schema).as("r"))
      .select("r.k", "r.v")

    val query = parsed.writeStream
      .format("memory")
      .queryName("xml_stream_out")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      Files.writeString(in.resolve("batch2.txt"), "<r><k>3</k><v>c</v></r>\n")
      query.processAllAvailable()
      val rows = spark.table("xml_stream_out").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally {
      query.stop()
    }
  }

  test("native xmlng stream source reads multi-line XML documents incrementally") {
    // Real XML documents — declaration, root tag, records spanning lines —
    // which the readStream.text + from_xml composition cannot handle.
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-native")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    def doc(rows: Seq[(Int, String)]): String =
      rows.map { case (k, v) => s"  <r>\n    <k>$k</k>\n    <v>$v</v>\n  </r>" }
        .mkString("<?xml version=\"1.0\"?>\n<rows>\n", "\n", "\n</rows>\n")
    Files.writeString(in.resolve("a.xml"), doc(Seq(1 -> "a", 2 -> "b")))

    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val stream = spark.readStream.format("xmlng")
      .option("rowTag", "r").schema(schema).load(in.toString)
    assert(stream.isStreaming)

    val query = stream.writeStream
      .format("memory").queryName("xmlng_native_stream").outputMode("append").start()
    try {
      query.processAllAvailable()
      Files.writeString(in.resolve("b.xml"), doc(Seq(3 -> "c")))
      query.processAllAvailable()
      val rows = spark.table("xmlng_native_stream").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally query.stop()
  }

  test("xmlng stream source recovers from a checkpoint without re-reading files") {
    // Parquet sink: fault-tolerant (memory sink refuses checkpoint restart),
    // and output accumulates across incarnations — duplicates would show.
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-recovery")
    val in = dir.resolve("in")
    val ckpt = dir.resolve("ckpt")
    val out = dir.resolve("out")
    Files.createDirectories(in)
    Files.writeString(in.resolve("f1.xml"), "<rows><r><k>1</k></r><r><k>2</k></r></rows>")
    val schema = StructType(Seq(StructField("k", LongType)))
    def start() = spark.readStream.format("xmlng")
      .option("rowTag", "r").schema(schema).load(in.toString)
      .writeStream.format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString).outputMode("append").start()

    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out.toString).count() === 2)

    // New file while the query is down; the restarted incarnation must
    // deliver exactly the new file — f1 replayed would duplicate keys 1,2.
    Files.writeString(in.resolve("f2.xml"), "<rows><r><k>3</k></r></rows>")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val ks = spark.read.parquet(out.toString).collect().map(_.getLong(0)).sorted.toSeq
      assert(ks === Seq(1L, 2L, 3L), s"restart must deliver f2 once and f1 never again: $ks")
    } finally q2.stop()
  }

  test("xmlng stream source: maxFilesPerTrigger paces discovery deterministically") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-paced")
    val in = dir.resolve("in"); val meta = dir.resolve("meta")
    Files.createDirectories(in)
    (1 to 3).foreach { i =>
      Files.writeString(in.resolve(s"f$i.xml"), s"<rows><r><k>$i</k></r></rows>")
      // distinct mtimes make FIFO ordering deterministic
      assert(in.resolve(s"f$i.xml").toFile.setLastModified(100000L * i))
    }
    val schema = StructType(Seq(StructField("k", LongType)))
    // Drive the Source's discovery directly: offsets advance one file per
    // trigger, each durably logged before the offset is surfaced.
    val src = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString,
      schema, Map("rowTag" -> "r", "maxFilesPerTrigger" -> "1"))
    val offsets = Seq(src.getOffset, src.getOffset, src.getOffset)
    assert(offsets.flatten.map(_.json).distinct.size === 3,
      "each trigger should discover exactly one file")
    assert(src.getOffset === offsets.last, "no new files -> offset unchanged")
    val logged = (0L to 2L).map { id =>
      new String(Files.readAllBytes(meta.resolve(id.toString)), "UTF-8").trim
    }
    assert(logged.forall(_.linesIterator.size == 1), s"one file per batch log: $logged")
    // Log lines are `path TAB mtime`; compare the file names.
    assert(logged.map(_.split('\t').head.split('/').last) ===
      Seq("f1.xml", "f2.xml", "f3.xml"), "FIFO by modification time")
    // A fresh incarnation over the same metadata dir re-reads the log and
    // discovers nothing new — restart cannot re-deliver seen files.
    val src2 = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString,
      schema, Map("rowTag" -> "r"))
    assert(src2.getOffset === offsets.last)

    // End-to-end pacing: a real query with maxFilesPerTrigger=1 must consume
    // the three files in (at least) three non-empty micro-batches.
    val q = spark.readStream.format("xmlng")
      .option("rowTag", "r").option("maxFilesPerTrigger", "1")
      .schema(schema).load(in.toString)
      .writeStream.format("memory").queryName("xmlng_paced").outputMode("append").start()
    try {
      q.processAllAvailable()
      val ks = spark.table("xmlng_paced").collect().map(_.getLong(0)).sorted.toSeq
      assert(ks === Seq(1L, 2L, 3L))
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= 3, s"expected >=3 paced batches, saw $nonEmpty")
    } finally q.stop()
  }

  test("xmlng stream source maxBytesPerTrigger paces by file size") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-bytes")
    val in = dir.resolve("in"); val meta = dir.resolve("meta")
    Files.createDirectories(in)
    val schema = StructType(Seq(StructField("k", LongType)))
    // Three ~60-byte files plus one oversized file; budget 150 bytes.
    (0 until 3).foreach { i =>
      val f = in.resolve(s"s$i.xml")
      Files.writeString(f, s"<rows><r><k>$i</k></r></rows>" + (" " * 30))
      assert(f.toFile.setLastModified(100000L * (i + 1)))
    }
    val big = in.resolve("s3big.xml")
    Files.writeString(big, s"<rows><r><k>3</k></r></rows>" + (" " * 400))
    assert(big.toFile.setLastModified(400000L))
    val src = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString,
      schema, Map("rowTag" -> "r", "maxBytesPerTrigger" -> "150"))
    // Trigger 1: s0+s1 fit in 150 bytes, s2 would cross.
    src.getOffset
    assert(src.loggedFiles(0L).map(_.split('/').last) === Seq("s0.xml", "s1.xml"))
    // Trigger 2: s2 alone (big would cross).
    src.getOffset
    assert(src.loggedFiles(1L).map(_.split('/').last) === Seq("s2.xml"))
    // Trigger 3: the oversized file must still be admitted alone.
    src.getOffset
    assert(src.loggedFiles(2L).map(_.split('/').last) === Seq("s3big.xml"))
  }

  test("xmlng stream source log compacts: bounded dir, replay and restart intact") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-compact")
    val in = dir.resolve("in"); val meta = dir.resolve("meta")
    Files.createDirectories(in)
    val schema = StructType(Seq(StructField("k", LongType)))
    val src = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString,
      schema, Map("rowTag" -> "r", "maxFilesPerTrigger" -> "1", "logCompactInterval" -> "10"))
    // 25 files discovered one per trigger → batches 0..24; compactions at 9, 19.
    (0 until 25).foreach { i =>
      val f = in.resolve(f"f$i%03d.xml")
      Files.writeString(f, s"<rows><r><k>$i</k></r></rows>")
      assert(f.toFile.setLastModified(100000L * (i + 1)))
      src.getOffset
    }
    val names = Files.list(meta).map[String](_.getFileName.toString)
      .filter(n => !n.startsWith(".")).sorted().toArray.toSeq
    assert(names.contains("19.compact"), s"latest snapshot missing: $names")
    assert(!names.contains("9.compact"), s"old snapshot must be deleted: $names")
    assert(names.map(_.toString).count(n => !n.endsWith(".compact")) === 5,
      s"only batches 20..24 should remain as numbered entries: $names")

    // A fresh incarnation rebuilds the full seen-set (no re-delivery) and can
    // replay a batch that only exists inside the snapshot.
    val src2 = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString,
      schema, Map("rowTag" -> "r"))
    assert(src2.getOffset.map(_.json) === Some("24"))
    val replayed = (3L to 4L).flatMap(src2.loggedFiles)
    assert(replayed.map(_.split('/').last) === Seq("f003.xml", "f004.xml"),
      "batches 3..4 live only in the compact snapshot and must replay from it")
  }

  test("xmlng stream source maxFileAgeMs: aged committed entries evict, no re-delivery") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-age")
    val in = dir.resolve("in"); val meta = dir.resolve("meta")
    Files.createDirectories(in)
    val schema = StructType(Seq(StructField("k", LongType)))
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val opts = Map("rowTag" -> "r", "maxFilesPerTrigger" -> "1",
      "logCompactInterval" -> "4", "maxFileAgeMs" -> "250000")
    val src = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString, schema, opts)
    // Files at mtimes 100k..800k; age window 250k behind the newest.
    (0 until 8).foreach { i =>
      val f = in.resolve(f"f$i%03d.xml")
      Files.writeString(f, s"<rows><r><k>$i</k></r></rows>")
      assert(f.toFile.setLastModified(100000L * (i + 1)))
      src.getOffset
      src.commit(LongOffset(i.toLong)) // engine has committed this batch
    }
    // Compaction at batch 7 (mtime watermark 800k, cutoff 550k): batches
    // 0..4 (mtimes 100k..500k) are committed AND aged → evicted from the
    // snapshot; recent ones survive.
    val compact = Files.readString(meta.resolve("7.compact"))
    assert(!compact.contains("f000.xml") && !compact.contains("f004.xml"),
      s"aged committed entries must leave the snapshot: $compact")
    assert(compact.contains("f005.xml") && compact.contains("f007.xml"),
      s"in-window entries must survive: $compact")

    // Restart: the aged files are listed in the input dir but must NOT be
    // re-delivered — discovery's age filter excludes them even though the
    // seen-set no longer holds them.
    val src2 = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString, schema, opts)
    assert(src2.getOffset.map(_.json) === Some("7"), "no new batch on restart")
    // A genuinely new in-window file is still picked up.
    val fresh = in.resolve("f100.xml")
    Files.writeString(fresh, "<rows><r><k>100</k></r></rows>")
    assert(fresh.toFile.setLastModified(900000L))
    assert(src2.getOffset.map(_.json) === Some("8"))
    assert(src2.loggedFiles(8L).map(_.split('/').last) === Seq("f100.xml"))
  }

  test("xmlng stream source: 1e5-file corpus — log and seen-set stay bounded",
      graft.pipeline.SlowTest) {
    // The one streaming path whose DRIVER-side cost grows with corpus file
    // count is discovery (one listing per trigger — the cost Spark's own
    // FileStreamSource pays too). Everything else must stay bounded:
    // compaction keeps the log dir at O(logCompactInterval) files and age
    // eviction keeps the snapshot/seen-set at O(files-per-age-window), no
    // matter how many files have ever streamed through. Proven here at the
    // 10^5-file mark.
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-scale")
    val in = dir.resolve("in"); val meta = dir.resolve("meta")
    Files.createDirectories(in)
    val n = 100000
    val record = "<rows><r><k>7</k></r></rows>".getBytes("UTF-8")
    (0 until n).foreach { i =>
      val f = in.resolve(f"f$i%06d.xml")
      Files.write(f, record)
      assert(f.toFile.setLastModified(1000000L + i))
    }
    val schema = StructType(Seq(StructField("k", LongType)))
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val opts = Map("rowTag" -> "r", "logCompactInterval" -> "2",
      "maxFileAgeMs" -> "100000")
    val src = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString, schema, opts)
    val t0 = System.nanoTime()
    assert(src.getOffset.map(_.json) === Some("0"), "all files in one batch")
    assert(src.loggedFiles(0L).size === n)
    src.commit(LongOffset(0L))
    // One newer file pushes the mtime watermark past every original file's
    // age window; the compaction at batch 1 must evict all n committed aged
    // entries from the snapshot.
    val fresh = in.resolve("g000000.xml")
    Files.write(fresh, record)
    assert(fresh.toFile.setLastModified(1200000L))
    assert(src.getOffset.map(_.json) === Some("1"))
    src.commit(LongOffset(1L))
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1e5-file discovery + compaction: $secs%.1f s")
    val compactLines = Files.readString(meta.resolve("1.compact"))
      .linesIterator.count(_.nonEmpty)
    assert(compactLines <= 3,
      s"snapshot must hold only in-window entries, found $compactLines lines")
    val metaFiles = Files.list(meta).filter(p =>
      !p.getFileName.toString.startsWith(".")).count()
    assert(metaFiles <= 3,
      s"log dir must stay O(interval) files, found $metaFiles")
    // Restart at 10^5 listed-but-evicted files: no re-delivery, and a new
    // in-window file still arrives.
    val src2 = new XmlStreamSource(spark.sqlContext, meta.toString, in.toString, schema, opts)
    assert(src2.getOffset.map(_.json) === Some("1"), "no new batch on restart")
    val fresh2 = in.resolve("g000001.xml")
    Files.write(fresh2, record)
    assert(fresh2.toFile.setLastModified(1300000L))
    assert(src2.getOffset.map(_.json) === Some("2"))
    assert(src2.loggedFiles(2L).map(_.split('/').last) === Seq("g000001.xml"))
  }

  test("xmlng stream source infers the schema from files present at start") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-infer")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("seed.xml"),
      "<rows><r><k>5</k><v>x</v></r></rows>")
    val stream = spark.readStream.format("xmlng")
      .option("rowTag", "r").load(in.toString)
    assert(stream.schema.fieldNames.sorted.toSeq === Seq("k", "v"))
    val query = stream.writeStream
      .format("memory").queryName("xmlng_inferred_stream").outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("xmlng_inferred_stream").count() === 1)
    } finally query.stop()
  }

  test("xmlng stream sink writes XML files a batch read parses back") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-sink")
    val in = dir.resolve("in"); val out = dir.resolve("out"); val ckpt = dir.resolve("ckpt")
    Files.createDirectories(in)
    Files.writeString(in.resolve("a.xml"),
      "<rows><r><k>1</k><v>a&amp;b</v></r><r><k>2</k><v>two</v></r></rows>")
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))

    def start() = spark.readStream.format("xmlng")
      .option("rowTag", "r").schema(schema).load(in.toString)
      .writeStream.format("xmlng")
      .option("rowTag", "rec").option("rootTag", "recs")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start(out.toString)

    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()

    // Second incarnation picks up a new input file; the sink must append it
    // without disturbing (or duplicating) batch-0 output.
    Files.writeString(in.resolve("b.xml"), "<rows><r><k>3</k><v>three</v></r></rows>")
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val back = spark.read.format("xmlng").option("rowTag", "rec")
      .schema(schema).load(out.toString)
    val rows = back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "a&b"), (2L, "two"), (3L, "three")))
    // Commit markers exist and sink part files carry their batch id.
    val commits = out.resolve("_xmlng_commits")
    assert(Files.list(commits).count() >= 2)
    val names = Files.list(out).map[String](_.getFileName.toString)
      .filter(n => n.startsWith("part-")).toArray
    assert(names.nonEmpty && names.forall(_.toString.matches("part-\\d+-.*")))
  }

  test("xmlng stream sink replay of a committed batch is a no-op") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-sink-replay")
    val out = dir.resolve("out")
    val sink = new XmlStreamSink(spark.sqlContext, out.toString, Map("rowTag" -> "r"))
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    sink.addBatch(0, df)
    val firstFiles = Files.list(out).map[String](_.getFileName.toString)
      .filter(_.startsWith("part-")).sorted().toArray.toSeq
    sink.addBatch(0, df) // replay after commit: must not duplicate
    val afterFiles = Files.list(out).map[String](_.getFileName.toString)
      .filter(_.startsWith("part-")).sorted().toArray.toSeq
    assert(afterFiles === firstFiles)
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    assert(spark.read.format("xmlng").option("rowTag", "r")
      .schema(schema).load(out.toString).count() === 2)
  }

  test("xmlng stream sink replay with fewer parts clears the stale tail") {
    // A crashed attempt may have rendered MORE part files than the replay
    // (e.g. restart on fewer cores): deterministic names overwrite the
    // shared prefix, and the fix must delete the rest or rows duplicate.
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-sink-shrink")
    val out = dir.resolve("out")
    val sink = new XmlStreamSink(spark.sqlContext, out.toString, Map("rowTag" -> "r"))
    val wide = Seq.tabulate(8)(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(4)
    sink.addBatch(0, wide)
    // Simulate the crash-before-marker: remove the commit marker, replay
    // the same batch rendered into fewer partitions.
    Files.delete(out.resolve("_xmlng_commits").resolve("0"))
    val narrow = Seq.tabulate(8)(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1)
    sink.addBatch(0, narrow)
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val back = spark.read.format("xmlng").option("rowTag", "r")
      .schema(schema).load(out.toString)
    assert(back.count() === 8, "stale parts from the wider attempt must be gone")
    val parts = Files.list(out).map[String](_.getFileName.toString)
      .filter(_.startsWith("part-")).toArray.toSeq
    assert(parts.size === 1, s"replay rendered one part, dir must hold one: $parts")
  }

  test("xmlng stream sink honors the compression codec; batch read splits it back") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-sink-codec")
    val out = dir.resolve("out")
    val sink = new XmlStreamSink(spark.sqlContext, out.toString,
      Map("rowTag" -> "r", "codec" -> "gzip"))
    sink.addBatch(0, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val files = Files.list(out).map[String](_.getFileName.toString)
      .filter(_.startsWith("part-")).sorted().toArray.toSeq.map(_.toString)
    assert(files.nonEmpty && files.forall(_.endsWith(".gz")), s"files: $files")
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val back = spark.read.format("xmlng").option("rowTag", "r")
      .schema(schema).load(out.toString)
    assert(back.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("xmlng stream sink prunes commit markers beyond the retention horizon") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-sink-retention")
    val out = dir.resolve("out")
    val sink = new XmlStreamSink(spark.sqlContext, out.toString,
      Map("rowTag" -> "r", "commitRetention" -> "3"))
    val df = Seq((1L, "x")).toDF("k", "v")
    (0L to 8L).foreach(sink.addBatch(_, df))
    val markers = Files.list(out.resolve("_xmlng_commits"))
      .map[String](_.getFileName.toString)
      .filter(!_.startsWith(".")) // local-FS .crc shadows
      .sorted().toArray.toSeq
    assert(markers === Seq("5", "6", "7", "8"), s"markers: $markers")
  }

  test("xmlng stream sink rejects non-append modes and partitionBy") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream-sink-modes")
    val counts = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .groupBy("value").count()
    val ex = intercept[Exception] {
      counts.writeStream.format("xmlng")
        .option("checkpointLocation", dir.resolve("c1").toString)
        .outputMode("complete").start(dir.resolve("o1").toString)
    }
    assert(ex.getMessage.contains("Append"), ex.getMessage)
  }

  test("streaming windowed aggregation over parsed XML events") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-stream2")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("b1.txt"),
      """<e><ts>2024-01-01T00:00:10Z</ts><kind>x</kind></e>
        |<e><ts>2024-01-01T00:00:20Z</ts><kind>x</kind></e>
        |<e><ts>2024-01-01T00:01:10Z</ts><kind>y</kind></e>
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("kind", StringType)))
    val counts = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(in.toString)
      .select(graft.xml.from_xml(col("value"), schema).as("e"))
      .select("e.ts", "e.kind")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("kind"))
      .count()

    val query = counts.writeStream
      .format("memory").queryName("xml_stream_win").outputMode("complete").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("xml_stream_win")
        .select("kind", "count").orderBy("kind")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows === Seq(("x", 2L), ("y", 1L)))
    } finally {
      query.stop()
    }
  }
}
