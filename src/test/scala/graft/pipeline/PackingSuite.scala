package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class PackingSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // token counts per doc: "w w w ..." with exactly n tokens
  private def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")

  private def fixture = Seq(
    // shard a: 100, 28, 1 → greedy(128): [100+28], [1]; concat: cut at 128
    (0L, doc(100), "a"),
    (1L, doc(28), "a"),
    (2L, doc(1), "a"),
    // shard b: oversized 300 alone, then 128 exact fit, then 0-token doc
    (3L, doc(300), "b"),
    (4L, doc(128), "b"),
    (5L, "", "b"),
    (6L, doc(5), "b")
  ).toDF("doc_id", "text", "source")

  test("greedy no-split: fit joins, overflow opens, oversized isolated") {
    val out = Packing.packGreedy(fixture, "doc_id", "text", "source", 128)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // shard a: 100 fits seq 0; 28 fits (100+28 = 128, not > budget); 1 overflows
    assert(out(0L) === (100L, 0L))
    assert(out(1L) === (28L, 0L))
    assert(out(2L) === (1L, 1L))
    // shard b: oversized 300 opens seq 0 alone (next doc must overflow);
    // 128 exact-fit opens seq 1; empty doc fits the full seq 1; 5 overflows
    assert(out(3L) === (300L, 0L))
    assert(out(4L) === (128L, 1L))
    assert(out(5L) === (0L, 1L)) // zero tokens fit even a full sequence
    assert(out(6L) === (5L, 2L))
  }

  test("packGreedyWithOffsets: offsets are the running in-sequence cursor") {
    val out = Packing.packGreedyWithOffsets(fixture, "doc_id", "text",
        "source", 128)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // same assignment as packGreedy, plus the cursor before admission
    assert(out(0L) === (100L, 0L, 0L))
    assert(out(1L) === (28L, 0L, 100L))
    assert(out(2L) === (1L, 1L, 0L))
    assert(out(3L) === (300L, 0L, 0L))
    assert(out(4L) === (128L, 1L, 0L))
    assert(out(5L) === (0L, 1L, 128L)) // zero tokens at the full cursor
    assert(out(6L) === (5L, 2L, 0L))
    // invariant: within every (shard, seq) the offsets tile exactly —
    // sorted by offset, each doc starts where the previous one ended
    val rows = Packing.packGreedyWithOffsets(fixture, "doc_id", "text",
        "source", 128)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(2)))
    rows.groupBy(t => (t._1, t._2)).values.foreach { seq =>
      var cursor = 0L
      seq.sortBy(_._3).foreach { case (_, _, off, n) =>
        assert(off === cursor)
        cursor += n
      }
    }
  }

  test("greedy matches an independent sequential replay on varied sizes") {
    // 200 docs over 4 shards with deterministic pseudo-random sizes,
    // including zeros, exact fits, and oversized outliers
    val rows = (0 until 200).map { i =>
      val n = ((i * 2654435761L >>> 7) % 97).toInt match {
        case m if m % 19 == 0 => 0
        case m if m % 23 == 0 => 150 // oversized
        case m => m
      }
      (i.toLong, doc(n), s"s${i % 4}")
    }
    val df = rows.toDF("doc_id", "text", "source")
    val got = Packing.packGreedy(df, "doc_id", "text", "source", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // replay the greedy recurrence per shard in plain Scala
    val expect = rows.groupBy(_._3).flatMap { case (_, ds) =>
      var seq = -1L; var used = 65L
      ds.sortBy(_._1).map { case (id, text, _) =>
        val tc = if (text.isEmpty) 0 else text.split("\\s+").length
        if (used + tc > 64) { seq += 1; used = 0 }
        used += tc
        id -> seq
      }
    }
    assert(got === expect)
  }

  test("concat-and-chunk: offsets, spans, and shard totals line up") {
    val out = Packing.packConcat(fixture, "doc_id", "text", "source", 128)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // shard a stream: 100 | 28 | 1 → doc0 [0,100), doc1 [100,128), doc2 [128,129)
    assert(out(0L) === (100L, 0L, 0L, 0L))
    assert(out(1L) === (28L, 0L, 100L, 0L)) // ends exactly at the cut, no span
    assert(out(2L) === (1L, 1L, 0L, 1L))
    // shard b stream: 300 | 128 | 0 | 5 → doc3 spans seqs 0-2, doc4 [300..427]
    // spans 2-3, doc5 empty at offset 428 in seq 3, doc6 [428,433) in seq 3
    assert(out(3L) === (300L, 0L, 0L, 2L))
    assert(out(4L) === (128L, 2L, 44L, 3L))
    assert(out(5L) === (0L, 3L, 44L, 3L)) // empty: ends where it starts
    assert(out(6L) === (5L, 3L, 44L, 3L))
    // invariants over every row: offset inside budget, seqs ordered
    out.values.foreach { case (_, sseq, soff, eseq) =>
      assert(soff >= 0 && soff < 128 && sseq <= eseq)
    }
  }

  test("all packing variants: one shuffle on the shard key, no extra exchange") {
    // range-backed frame so ConvertToLocalRelation can't fold the plan away
    val df = spark.range(1000).select(
      col("id").as("doc_id"),
      concat_ws(" ", typedLit(Seq.fill(7)("w"))).as("text"),
      (col("id") % 8).cast("string").as("source"))
    for (plan <- Seq(
        Packing.packGreedy(df, "doc_id", "text", "source", 64),
        Packing.packConcat(df, "doc_id", "text", "source", 64),
        Packing.packSequences(df, "doc_id", "text", "source", 64))) {
      val physical = plan.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
      assert(exchanges === 1, s"expected exactly one shuffle:\n$physical")
    }
  }

  test("greedy with an effectively unbounded budget packs one sequence per shard") {
    val out = Packing.packGreedy(fixture, "doc_id", "text", "source", Long.MaxValue)
      .select("shard", "seq_idx").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSet === Set("a" -> 0L, "b" -> 0L))
  }

  test("packSequences materializes exactly packGreedy's assignment") {
    val assign = Packing.packGreedy(fixture, "doc_id", "text", "source", 128)
      .collect().map(r => (r.getString(1), r.getLong(3)) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val seqs = Packing.packSequences(fixture, "doc_id", "text", "source", 128)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(seqs.keySet === assign.keySet) // same sequences exist
    // shard a seq 0 = docs 0+1 (100+28 tokens), joined in id order
    assert(seqs(("a", 0L)) === ((doc(100) + " " + doc(28), 128L, 2L)))
    assert(seqs(("a", 1L)) === ((doc(1), 1L, 1L)))
    // shard b: oversized alone; exact-fit + empty doc join; 5 alone
    assert(seqs(("b", 0L)) === ((doc(300), 300L, 1L)))
    assert(seqs(("b", 1L)) === ((doc(128) + " ", 128L, 2L))) // empty doc joins
    assert(seqs(("b", 2L)) === ((doc(5), 5L, 1L)))
    // doc counts agree with the assignment
    assign.foreach { case (k, ids) => assert(seqs(k)._3 === ids.length.toLong) }
  }

  test("duplicate (shard, id): all variants deterministic via md5(text) tiebreak") {
    // Two documents share (shard a, id 1) with DIFFERENT texts and token
    // counts — without the tiebreak their relative order (and therefore
    // every downstream sequence assignment) would be sort luck. The
    // expected order is (id, md5(text)): the spec computes the digests
    // itself rather than hardcoding which text wins.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val tBig = doc(100) // 100 tokens
    val tSmall = doc(50) // 50 tokens
    val rows = Seq((1L, tBig, "a"), (1L, tSmall, "a"), (2L, doc(10), "a"))
    // scan order under the tiebreak: the two id-1 docs by md5, then id 2
    val dup = Seq(tBig, tSmall).sortBy(md5hex)
    val ordered = dup.map(t => (1L, t)) :+ (2L -> doc(10))
    def tc(t: String) = t.split("\\s+").length.toLong
    // run each variant over the natural AND a scrambled/reversed layout —
    // a tie broken by partition order instead of the digest would differ
    for (df <- Seq(rows.toDF("doc_id", "text", "source"),
        rows.reverse.toDF("doc_id", "text", "source").repartition(7))) {
      // greedy budget 128: first dup opens seq 0; 100+50 and 50+100 both
      // overflow, so the second dup opens seq 1; doc 2 (10 tokens) joins it
      val greedy = Packing.packGreedy(df, "doc_id", "text", "source", 128)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      assert(greedy === Set((1L, tc(ordered(0)._2), 0L),
        (1L, tc(ordered(1)._2), 1L), (2L, 10L, 1L)))
      // concat: cum_before = 0, tc(first), tc(first)+tc(second) in md5 order
      val concat = Packing.packConcat(df, "doc_id", "text", "source", 128)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val c1 = tc(ordered(0)._2)
      assert(concat === Set((1L, c1, 0L, 0L), (1L, 150L - c1, c1 / 128, c1 % 128),
        (2L, 10L, 150L / 128, 150L % 128)))
      // materialized sequences: member text joins in the SAME digest order
      val seqs = Packing.packSequences(df, "doc_id", "text", "source", 128)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(seqs === Map(0L -> ordered(0)._2,
        1L -> (ordered(1)._2 + " " + doc(10))))
    }
  }

  test("packing respects budget: greedy sequences never exceed it") {
    val out = Packing.packGreedy(fixture, "doc_id", "text", "source", 128)
      .groupBy("shard", "seq_idx").agg(sum("n_tokens").as("filled"),
        count(lit(1)).as("n_docs"))
      .collect()
    out.foreach { r =>
      val filled = r.getLong(2)
      // a sequence over budget is only legal when it is one oversized doc
      assert(filled <= 128 || r.getLong(3) === 1L,
        s"overfull multi-doc sequence: $r")
    }
  }

  test("padding waste: hand-computed batches, both strategies") {
    val df = Seq(
      (0L, doc(10), "a"), (1L, doc(2), "a"), (2L, doc(8), "a"), (3L, doc(4), "a")
    ).toDF("doc_id", "text", "source")
    val out = Packing.paddingWasteReport(df, "doc_id", "text", "source", 2)
      .collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    // arrival (id order): [10,2] [8,4] → padded 10·2 + 8·2 = 36, total 24
    assert(out("arrival") === ((4L, 2L, 24L, 36L, 12L * 1000 / 36)))
    // sorted (length order): [2,4] [8,10] → padded 4·2 + 10·2 = 28
    assert(out("sorted") === ((4L, 2L, 24L, 28L, 4L * 1000 / 28)))
  }

  test("padding waste: sorted never wastes more than arrival; empties are safe") {
    // varied pseudo-random lengths across 3 shards, plus an all-empty shard
    val rows = (0L until 97L).map { i =>
      (i, doc(((i * 37 + 11) % 50).toInt), s"s${i % 3}")
    } ++ Seq((200L, "", "z"), (201L, null.asInstanceOf[String], "z"))
    val out = Packing.paddingWasteReport(
        rows.toDF("doc_id", "text", "source"), "doc_id", "text", "source", 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(4), r.getLong(6)))
      .toMap
    Seq("s0", "s1", "s2").foreach { sh =>
      assert(out((sh, "sorted"))._2 <= out((sh, "arrival"))._2,
        s"length-bucketing must not increase waste on $sh")
    }
    // all-empty shard: padded volume 0 → waste 0 by convention, not a crash
    assert(out(("z", "arrival")) === ((0L, 0L)))
    assert(out(("z", "sorted")) === ((0L, 0L)))
  }
}
