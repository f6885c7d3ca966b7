package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

/**
 * The q40 sessionization operator running as a stream: same
 * `Sessionize.sessions` call, fed by a file stream with a watermark.
 * Sessions are emitted in append mode once the watermark passes their
 * close — bounded state, no hand-rolled mapGroupsWithState.
 */
class StreamingSessionSuite extends AnyFunSuite {

  test("stateful dedup drops duplicate keys across micro-batches") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-statededup")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("b1.csv"),
      """1,a,2024-01-01T00:00:00Z
        |2,b,2024-01-01T00:00:05Z
        |1,dup-in-batch,2024-01-01T00:00:10Z
        |""".stripMargin)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    val docs = spark.readStream.schema(schema).csv(in.toString)
      .withWatermark("ts", "10 seconds")
    val deduped = Dedup.dropDuplicatesStateful(docs, "doc_id", "ts", 3600L * 1000)

    val query = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      // Second batch: 1 and 2 repeat (state must drop them), 3 is new.
      Files.writeString(in.resolve("b2.csv"),
        """1,dup-later,2024-01-01T00:01:00Z
          |3,c,2024-01-01T00:01:05Z
          |2,dup-later,2024-01-01T00:01:10Z
          |""".stripMargin)
      query.processAllAvailable()
      val rows = spark.table("dedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(rows.map(_._1) === Seq(1L, 2L, 3L))
      assert(rows.contains((1L, "a")) && rows.contains((2L, "b")) && rows.contains((3L, "c")))
    } finally {
      query.stop()
    }
  }

  test("stateful NEAR-dup suppression drops same-sketch docs across micro-batches") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-neardedup")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    // doc 2 repeats doc 1's tokens REORDERED with duplicates: a different
    // string, the same distinct-token set, therefore the same sketch.
    Files.writeString(in.resolve("b1.csv"),
      """1,alpha beta gamma delta,2024-01-01T00:00:00Z
        |2,delta gamma beta alpha alpha,2024-01-01T00:00:05Z
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    val docs = spark.readStream.schema(schema).csv(in.toString)
      .withWatermark("ts", "10 seconds")
    val out = Dedup.dropNearDuplicatesStateful(docs, "text", "ts", 3600L * 1000)
    assert(out.columns.toSeq === Seq("doc_id", "text", "ts"), "helper column must not leak")
    val query = out.writeStream
      .format("memory").queryName("neardedup_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      Files.writeString(in.resolve("b2.csv"),
        """3,beta alpha delta gamma,2024-01-01T00:01:00Z
          |4,completely different words here,2024-01-01T00:01:05Z
          |""".stripMargin)
      query.processAllAvailable()
      val ids = spark.table("neardedup_out").collect().map(_.getLong(0)).sorted
      // 2 (same batch) and 3 (later batch) share doc 1's sketch → dropped
      assert(ids.toSeq === Seq(1L, 4L))
    } finally {
      query.stop()
    }
  }

  test("stateful dedup also runs on a batch frame") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"))
      .toDF("doc_id", "text")
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
    val out = Dedup.dropDuplicatesStateful(df, "doc_id", "ts", 3600L * 1000)
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("funnel: ordered stages count, out-of-order events do not") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1: view(1) -> click(2) -> purchase(3): reaches all stages
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: click BEFORE first view, purchase after -> stops at view
      // (the purchase cannot qualify: no click at/after the first view)
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
      // user 3: view only
      (3L, "view", ts(5)),
      // user 4: click/purchase but never views -> counts nowhere
      (4L, "click", ts(1)), (4L, "purchase", ts(2)),
      // user 5: view(1), click(2), second click(4), purchase(3) -> the
      // purchase at 3 is at/after the FIRST qualifying click (2): reaches all
      (5L, "view", ts(1)), (5L, "click", ts(2)), (5L, "click", ts(4)),
      (5L, "purchase", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val out = Sessionize.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1) === (("view", 4L, 1000L)))      // users 1, 2, 3, 5
    assert(out(2) === (("click", 2L, 500L)))      // users 1, 5
    assert(out(3) === (("purchase", 2L, 500L)))   // users 1, 5
  }

  test("retention cohorts: epoch-week matrix, offsets bounded, distinct users") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // epoch weeks run Thu-Wed (day 0, 1970-01-01, was a Thursday):
    // 2024-01-01 -> epoch day 19723 div 7 = week 2817
    val ev = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-02")), // same week: offset 0 once
      (1L, ts("2024-01-08")),                          // offset 1
      (1L, ts("2024-01-25")),                          // epoch day 19747 -> offset 4
      (2L, ts("2024-01-03")),                          // cohort week 0 only
      (3L, ts("2024-01-10")), (3L, ts("2024-04-20"))   // later cohort; offset 15 drops
    ).toDF("user_id", "ts")
    val out = Sessionize.retentionCohorts(ev, "user_id", "ts", 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay / 7
    assert(out((w0, 0L)) === 2L)      // users 1 and 2 active in their first week
    assert(out((w0, 1L)) === 1L)      // user 1 returns
    assert(out((w0, 4L)) === 1L)
    val w1 = java.time.LocalDate.of(2024, 1, 10).toEpochDay / 7
    assert(out((w1, 0L)) === 1L)      // user 3's own cohort
    assert(!out.keys.exists(_._2 > 12L), "offsets past maxWeeks must drop")
    assert(out.size === 4)
  }

  test("session_window sessionization runs incrementally with a watermark") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft-sessions")
    val in = dir.resolve("in")
    Files.createDirectories(in)
    // user 1: two events 5 min apart (one session), then 2h silence;
    // user 2: one event.
    Files.writeString(in.resolve("b1.csv"),
      """1,2024-01-01T00:00:00Z
        |1,2024-01-01T00:05:00Z
        |2,2024-01-01T00:10:00Z
        |""".stripMargin)

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val events = spark.readStream.schema(schema).csv(in.toString)
      .withWatermark("ts", "10 minutes")
    val sessions = Sessionize.sessions(events, "user_id", "ts", "30 minutes")

    val query = sessions.writeStream
      .format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      // Advance event time far enough that the watermark closes everything.
      Files.writeString(in.resolve("b2.csv"), "3,2024-01-01T06:00:00Z\n")
      query.processAllAvailable()
      Files.writeString(in.resolve("b3.csv"), "3,2024-01-01T12:00:00Z\n")
      query.processAllAvailable()

      val rows = spark.table("sessions_out")
        .select("user_id", "events").orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.contains((1L, 2L))) // merged session of two events
      assert(rows.contains((2L, 1L)))
    } finally {
      query.stop()
    }
  }
}
