package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class PipelineSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "a"),
    (1L, "the quick brown fox jumps over the lazy cat", "a"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog", "a"), // exact dup of 0
    (3L, "completely different words entirely here now", "b"),
    (4L, "", "b")
  ).toDF("doc_id", "text", "source")

  test("rendezvousAssign: removing a shard reassigns ONLY that shard's keys") {
    val keys = (0L until 200L).toDF("k")
    val all = Seq("s0", "s1", "s2", "s3", "s4")
    val before = Sampling.rendezvousAssign(keys, "k", all)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before.values.toSet.size === 5) // every shard gets some keys
    val after = Sampling.rendezvousAssign(keys, "k", all.filterNot(_ == "s2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    before.foreach { case (k, sh) =>
      if (sh != "s2") assert(after(k) === sh, s"key $k moved off $sh")
      else assert(after(k) !== "s2")
    }
    intercept[IllegalArgumentException] {
      Sampling.rendezvousAssign(keys, "k", Seq("a", "a"))
    }
  }

  test("peakConcurrency: half-open boundaries close before they open") {
    val iv = Seq(
      ("u", 0L, 10L), ("u", 5L, 15L), ("u", 10L, 20L), // peak 2, first at 5
      ("w", 0L, 5L), ("w", 5L, 10L),                   // back-to-back: peak 1
      ("w", 3L, 3L)                                    // invalid — dropped
    ).toDF("k", "s", "e")
    val got = Sessionize.peakConcurrency(iv, "k", "s", "e")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("u") === ((3L, 2L, 5L)))
    assert(got("w") === ((2L, 1L, 0L)))
  }

  test("tableChecksum: order/layout invariant, null distinct from absent") {
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, None)).toDF("k", "v")
    val shuffled = a.orderBy(desc("k")).repartition(7)
    val ca = Profile.tableChecksum(a, Seq("k", "v")).collect()(0)
    val cb = Profile.tableChecksum(shuffled, Seq("k", "v")).collect()(0)
    assert(ca === cb)
    assert(ca.getLong(0) === 3L)
    // NULL must not checksum like a dropped column value.
    val c1 = Profile.tableChecksum(Seq((1L, Option.empty[String])).toDF("k", "v"),
      Seq("k", "v")).collect()(0)
    val c2 = Profile.tableChecksum(Seq((1L, "")).toDF("k", "v"),
      Seq("k", "v")).collect()(0)
    assert(c1.getLong(1) !== c2.getLong(1))
  }

  test("trendingTopK: every event lands in windowDur/slide windows, rank ties on item") {
    val ev = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:07:00"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:07:00"), "b"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:07:00"), "a")
    ).toDF("ts", "item")
    val out = Sessionize.trendingTopK(ev, "ts", "item", "1 hour", "15 minutes", k = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // 4 overlapping windows (starts 09:15..10:00), each topped by 'a' (2 > 1).
    assert(out.length === 4)
    assert(out.forall { case (_, rank, item, n) => rank == 1 && item == "a" && n == 2 })
    val starts = out.map(_._1).sorted
    assert(starts.last - starts.head === 45L * 60 * 1000000)
  }

  test("weightedSampleNoReplacement: PPS order, exclusions, determinism") {
    val df = Seq(
      (1L, 1e6),     // key ~ ln(u)/1e6 -> barely negative, always wins
      (2L, 1e-6),    // key ~ ln(u)*1e6 -> hugely negative
      (3L, 0.0),     // excluded
      (4L, -5.0)     // excluded
    ).toDF("id", "w")
    val top1 = Sampling.weightedSampleNoReplacement(df, "id", "w", k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(top1 === Seq(1L))
    val all = Sampling.weightedSampleNoReplacement(df, "id", "w", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(all === Set(1L, 2L)) // zero/negative weights never sampled
    val again = Sampling.weightedSampleNoReplacement(df, "id", "w", k = 10)
      .collect().toSeq
    assert(again === Sampling.weightedSampleNoReplacement(df, "id", "w", k = 10)
      .collect().toSeq)
    // Non-integral id refuses loudly (a string id would null-cast and
    // null-keyed rows could fill top-k slots silently); null ids drop.
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSampleNoReplacement(
        Seq(("a", 1.0)).toDF("id", "w"), "id", "w", k = 1)
    }
    assert(e.getMessage.contains("weightedSampleNoReplacement"))
    val withNull = Seq((Option.empty[Long], 9.0), (Some(7L), 1.0))
      .toDF("id", "w")
    assert(Sampling.weightedSampleNoReplacement(withNull, "id", "w", k = 2)
      .collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("repeatedPassageReport: cross-doc windows union; self-repeats don't count") {
    val df = Seq(
      (0L, "XXABCDEFGHXX"), // shares ABCDEFGH with doc 1, offset by 2
      (1L, "ABCDEFGH"),
      (2L, "ZZZZZZZZZZ"),   // internal repeats only — ONE distinct doc
      (3L, "AB")            // shorter than the window — omitted
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedPassageReport(df, "doc_id", "text",
        windowLen = 4, stride = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // (n_windows, n_blocks, copied_chars, copy_permille)
    assert(out(0L) === ((3L, 1L, 8L, 666L))) // [2,10) of 12 chars
    assert(out(1L) === ((3L, 1L, 8L, 1000L)))
    assert(out(2L) === ((0L, 0L, 0L, 0L)))
    assert(!out.contains(3L))
  }

  test("intervalCoverage: overlaps union, adjacency merges, invalids counted") {
    val iv = Seq(
      // a: (0,10)+(5,12) overlap -> block [0,12); (20,25) separate
      ("a", 0L, 10L), ("a", 5L, 12L), ("a", 20L, 25L),
      ("a", 30L, 30L),                     // zero-length -> dropped
      // b: [50,60) + [52,55) contained + [60,70) adjacent -> ONE block
      ("b", 50L, 60L), ("b", 52L, 55L), ("b", 60L, 70L),
      // c: nothing valid
      ("c", 7L, 3L)
    ).toDF("k", "s", "e")
    val out = Sessionize.intervalCoverage(iv, "k", "s", "e")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // (n_intervals, n_blocks, n_dropped, covered, covered_permille)
    assert(out("a") === ((3L, 2L, 1L, 17L, 680L))) // 17 * 1000 div 25
    assert(out("b") === ((3L, 1L, 0L, 20L, 1000L)))
    assert(out("c") === ((0L, 0L, 1L, 0L, 0L)))
  }

  test("exact dedup groups identical texts") {
    val reps = Dedup.exactRepresentatives(docs, "doc_id", "text")
    val m = reps.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(m(0L) === 2L) // docs 0 and 2 collapse, representative id 0
    assert(reps.count() === 4)
    assert(Dedup.exactDedup(docs, "doc_id", "text").count() === 4)
  }

  test("incremental dedup: corpus content dropped, batch dedups internally, nulls survive") {
    val corpus = Seq((100L, "already curated content"), (101L, "more curated text"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "already curated content"),  // exists in corpus -> dropped
      (2L, "genuinely new document"),   // new, duplicated in-batch
      (5L, "genuinely new document"),   // in-batch dup of 2
      (3L, "another new one"),
      (4L, null.asInstanceOf[String])   // null text: never matches corpus
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExactDedup(batch, corpus, "doc_id", "text")
      .select("doc_id", "dup_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("incremental dedup against an empty corpus equals plain exact dedup") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val viaIncremental = Dedup.incrementalExactDedup(docs, empty, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaExact = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaIncremental === viaExact)
  }

  test("minhash finds near-dup and exact pairs, not unrelated ones") {
    val pairs = Dedup.minHashDedupPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((0L, 2L))) // exact: jaccard 1.0
    assert(ids.contains((0L, 1L)) && ids.contains((1L, 2L))) // near-dup
    assert(!ids.exists { case (a, b) => a == 3L || b == 3L })
    val exact = pairs.find(p => p._1 == 0L && p._2 == 2L).get
    assert(exact._3 === 1.0)
  }

  test("simhash pairs: identical docs at hamming 0") {
    val pairs = Dedup.simHashDedupPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L && p._3 === 0))
  }

  test("minhash survives a degenerate all-duplicates corpus") {
    // 2,000 identical docs land in one (band, bucket) group for every band.
    // The group must collapse to a single distinct signature (ids only in
    // memory) and stream out exactly C(2000,2) pairs, each emitted once.
    val n = 2000
    val degen = (0 until n).map(i => (i.toLong, "all work and no play makes jack a dull boy"))
      .toDF("doc_id", "text")
    val cnt = Dedup.minHashDedupPairs(degen, "doc_id", "text", 0.9).count()
    assert(cnt === n.toLong * (n - 1) / 2)
  }

  test("minhash mega-clique verifies across MULTIPLE tasks (pair-block sharding)") {
    // A planted 64-member near-dup clique of DISTINCT documents (shared
    // 40-token core + one unique token each: jaccard 40/42 ≈ 0.952) is
    // one connected component. With pairBlockSize=16 the component
    // shards into ceil(64/16)=4 index blocks → 10 (blo, bhi) pair-block
    // keys, so the C(64,2) verification must emit from MORE than one
    // task — the serial-funnel shape the sharding exists to kill — while
    // the pair SET stays exactly the clique's triangle.
    val core = (0 until 40).map(i => s"w$i").mkString(" ")
    val clique = spark.range(64)
      .select(col("id").as("doc_id"),
        concat(lit(core), lit(" u"), col("id").cast("string")).as("text"))
    val res = Dedup.minHashDedupPairs(clique, "doc_id", "text", 0.9,
      pairBlockSize = 16)
    val emittingTasks = res.select(spark_partition_id().as("pid"))
      .distinct().count()
    assert(emittingTasks > 1,
      s"mega-clique verification funneled through $emittingTasks task(s)")
    val rows = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 64 * 63 / 2)
    assert(rows.map(p => (p._1, p._2)).toSet ===
      (for (a <- 0L until 64L; b <- a + 1 until 64L) yield (a, b)).toSet)
    assert(rows.forall(p => p._3 >= 0.9 && p._3 < 1.0))
    // The sharded answer is the unsharded answer: one giant block
    // degenerates to the single (0,0) pair-block per component.
    val unsharded = Dedup.minHashDedupPairs(clique, "doc_id", "text", 0.9,
        pairBlockSize = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.toSet === unsharded)
  }

  test("containment pairs: catches snippets Jaccard misses, asymmetric, blocked") {
    val snippet = "alpha beta gamma delta epsilon zeta"
    val container = snippet + " " + (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val df = Seq(
      (1L, snippet, "a"),          // 4 trigrams, all inside container
      (2L, container, "a"),
      (3L, snippet, "b"),          // same text, different block: no pair
      (4L, "totally unrelated content stream here", "a")
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.containmentPairs(df, "doc_id", "text", "source", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 1 ⊂ 2 at containment 1.0; the reverse direction is far below 0.8;
    // block b isolates doc 3; doc 4 pairs with nothing.
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
    // Sanity: symmetric Jaccard at the same threshold misses the pair.
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", "source", 3, 0.8)
    assert(!jac.collect().exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("containment pairs: exact duplicates contain each other both ways") {
    val df = Seq(
      (1L, "one two three four five six seven", "a"),
      (2L, "one two three four five six seven", "a")
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.containmentPairs(df, "doc_id", "text", "source", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("ngram prefix join matches the quadratic exact join") {
    val extra = Seq(
      (5L, "one two three four five six seven eight nine ten", "a"),
      (6L, "one two three four five six seven eight nine zen", "a"),
      (7L, "one two three four five six seven eight nine ten", "b")
    ).toDF("doc_id", "text", "source")
    val corpus = docs.unionAll(extra)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pre = pairSet(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", "source", 2, 0.3))
    val quad = pairSet(Dedup.ngramJaccardPairsQuadratic(corpus, "doc_id", "text", "source", 2, 0.3))
    assert(pre === quad)
    assert(pre.nonEmpty)
  }

  test("ngram jaccard within blocking key") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("paragraph dedup keeps first occurrence and reassembles in order") {
    val docs = Seq(
      (0L, "alpha\n\nbeta"),
      (1L, "beta\n\ngamma\n\nalpha"), // beta + alpha seen in doc 0: keeps gamma
      (2L, "delta\n\ndelta"), // within-doc duplicate: keeps the first only
      (3L, "alpha\n\nbeta") // fully duplicate document -> empty, not dropped
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "alpha\n\nbeta")
    assert(out(1L) === "gamma")
    assert(out(2L) === "delta")
    assert(out(3L) === "")
  }

  test("paragraph dedup matches a sequential reference on random corpora") {
    val rnd = new scala.util.Random(77)
    val pool = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "")
    val docs = (0 until 80).map { i =>
      val k = rnd.nextInt(5) + 1
      (i.toLong, (0 until k).map(_ => pool(rnd.nextInt(pool.size))).mkString("\n\n"))
    }
    // Sequential reference: walk documents in id order, keep first sightings.
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.map { case (id, t) =>
      id -> t.split("\n\n", -1).filter(seen.add).mkString("\n\n")
    }.toMap
    val got = Dedup.dedupParagraphs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected)
  }

  test("duplicate-span coverage: hand-computed fractions, span union, edges") {
    val docs = Seq(
      (0L, "a b c d e"),          // all 3-grams shared with doc 5 -> 1.0
      (1L, "x a b c y"),          // only "a b c" (pos 1) duplicated -> 3/5
      (2L, "z z z"),              // its one gram exists nowhere else -> 0
      (3L, "q r"),                // fewer than n tokens -> 0
      (4L, null.asInstanceOf[String]), // null text -> 0
      (5L, "a b c d e"),          // exact dup of doc 0 -> 1.0
      // dup grams at pos 0 ("a b c") and pos 7 ("c d e"); the within-doc
      // repeat "m m m" does NOT count (min(doc)=max(doc)) -> (3+3)/10
      (6L, "a b c m m m m c d e")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanCoverage(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(0L) === ((5L, 1.0)))
    assert(out(1L) === ((3L, 0.6)))
    assert(out(2L) === ((0L, 0.0)))
    assert(out(3L) === ((0L, 0.0)))
    assert(out(4L) === ((0L, 0.0)))
    assert(out(5L) === ((5L, 1.0)))
    assert(out(6L) === ((6L, 0.6)))
    assert(out.size === 7, "every input row must appear exactly once")
  }

  test("duplicate-span coverage matches a sequential reference on random corpora") {
    val rnd = new scala.util.Random(41)
    val pool = Vector("a", "b", "c", "d", "e")
    val n = 4
    val docs = (0 until 60).map { i =>
      val k = rnd.nextInt(12)
      (i.toLong, (0 until k).map(_ => pool(rnd.nextInt(pool.size))).mkString(" "))
    }
    // Reference: string grams, dup = in >=2 distinct docs, coverage = union
    // of [p, p+n) intervals — computed with a plain per-position bitmap.
    val gramDocs = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    def gramsOf(t: String): Seq[(Int, String)] = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      (0 to toks.length - n).map(p => p -> toks.slice(p, p + n).mkString(" "))
    }
    docs.foreach { case (id, t) =>
      gramsOf(t).foreach { case (_, g) =>
        gramDocs.getOrElseUpdate(g, scala.collection.mutable.Set()) += id
      }
    }
    val expected = docs.map { case (id, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val covered = new Array[Boolean](toks.length)
      gramsOf(t).foreach { case (p, g) =>
        if (gramDocs(g).size >= 2) (p until p + n).foreach(covered(_) = true)
      }
      val c = covered.count(identity)
      id -> ((c.toLong,
        if (toks.isEmpty) 0.0
        else BigDecimal(c.toDouble / toks.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = Dedup.duplicateSpanCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expected)
  }

  test("remove duplicate spans: cuts covered tokens, keeps order, edges") {
    val docs = Seq(
      (0L, "a b c d e"),          // whole doc covered (dup of 5) -> ""
      (1L, "x a b c y"),          // "a b c" cut -> "x y"
      (2L, "z z z"),              // nothing shared -> unchanged
      (3L, "q r"),                // fewer than n tokens -> unchanged
      (4L, null.asInstanceOf[String]), // null text -> ""
      (5L, "a b c d e"),          // symmetric: the other copy empties too
      (6L, "a b c m m m m c d e") // spans at both ends cut, middle survives
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "")
    assert(out(1L) === "x y")
    assert(out(2L) === "z z z")
    assert(out(3L) === "q r")
    assert(out(4L) === "")
    assert(out(5L) === "")
    assert(out(6L) === "m m m m")
    assert(out.size === 7)
  }

  test("remove duplicate spans matches a sequential reference on random corpora") {
    val rnd = new scala.util.Random(43)
    val pool = Vector("a", "b", "c", "d", "e")
    val n = 4
    val docs = (0 until 60).map { i =>
      val k = rnd.nextInt(12)
      (i.toLong, (0 until k).map(_ => pool(rnd.nextInt(pool.size))).mkString(" "))
    }
    val gramDocs = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    def gramsOf(t: String): Seq[(Int, String)] = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      (0 to toks.length - n).map(p => p -> toks.slice(p, p + n).mkString(" "))
    }
    docs.foreach { case (id, t) =>
      gramsOf(t).foreach { case (_, g) =>
        gramDocs.getOrElseUpdate(g, scala.collection.mutable.Set()) += id
      }
    }
    val expected = docs.map { case (id, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val covered = new Array[Boolean](toks.length)
      gramsOf(t).foreach { case (p, g) =>
        if (gramDocs(g).size >= 2) (p until p + n).foreach(covered(_) = true)
      }
      id -> toks.zipWithIndex.collect { case (tk, i) if !covered(i) => tk }.mkString(" ")
    }.toMap
    val got = Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected)
  }

  test("lsh auto-sizing row estimate needs no count() pass") {
    // In-memory relation: sizeInBytes = rowCount × (8 + Σ field defaultSize),
    // so the inversion is exact.
    val local = (0 until 1000).map(i => (i.toLong, Array.fill(64)(i.toFloat)))
      .toDF("vec_id", "embedding")
    assert(Similarity.estimateRows(local, 64, 0L) === 1000L)
    // File scan: compressed on-disk bytes over the float payload width with
    // 2× codec headroom — order of magnitude is all auto-sizing needs.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val est = Similarity.estimateRows(emb, 64, 0L)
    assert(est >= n / 4 && est <= n * 16, s"estimate $est vs true $n")
    // An explicit hint always wins.
    assert(Similarity.estimateRows(emb, 64, 1234L) === 1234L)
  }

  test("cosine similarity and top-k") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "vec_id", "embedding", 2)
    val got = topk.collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got === Seq((1, 1L), (2, 2L)))

    val pairs = Similarity.bruteForceNearPairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)))
  }

  test("lsh near pairs find what brute force finds at high threshold") {
    val vecs = (0 until 50).map { i =>
      val base = Array.tabulate(16)(j => math.sin(i * 17 + j).toFloat)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    // identical-vector planted pair
    val planted = Seq((100L, Array.tabulate(16)(j => math.sin(3 * 17 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val all = vecs.union(planted)
    val got = Similarity.lshNearPairs(all, "vec_id", "embedding", 16, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.contains((3L, 100L)))
  }

  test("ivf topk finds the planted identical vector") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 17 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val planted = Seq((100L, Array.tabulate(16)(j => math.sin(3 * 17 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val all = vecs.union(planted)
    val got = Similarity.ivfTopK(
      all.filter(col("vec_id") === 3), all, "vec_id", "vec_id", "embedding",
      k = 1, nlist = 8, nprobe = 3)
    val top = got.collect()
    assert(top.length === 1)
    assert(top(0).getAs[Long]("neighbor_id") === 100L)
    assert(math.abs(top(0).getAs[Double]("sim") - 1.0) < 1e-9)
  }

  test("ivf recall@5 >= 0.95 vs exact at q33 parameters") {
    // The q33 operating point, gated against the exact oracle on the real
    // sf0.001 embeddings. Also proves multi-assignment dedup: each query
    // yields exactly k distinct neighbors even though replicas=3 scores
    // some (query, neighbor) pairs in more than one probed cell.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRows = Similarity.ivfTopK(q, emb, "vec_id", "vec_id", "embedding", 5,
        nlist = 32, nprobe = 12, replicas = 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ivfRows.length === ivfRows.toSet.size, "duplicate neighbors in ivf output")
    assert(ivfRows.length === exact.size)
    val recall = (exact & ivfRows.toSet).size.toDouble / exact.size
    assert(recall >= 0.95, s"ivf recall@5 $recall below gate")
  }

  test("semantic dedup keeps one representative per embedding cluster") {
    // Two tight clusters + two singletons. Cluster A = {0,1,2} (near-identical
    // directions), cluster B = {10,11}; 20 and 21 are far from everything.
    def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val emb = Seq(
      (0L, vec(1, 0, 0, 0.00)), (1L, vec(1, 0, 0, 0.01)), (2L, vec(1, 0, 0, 0.02)),
      (10L, vec(0, 1, 0, 0.00)), (11L, vec(0, 1, 0, 0.01)),
      (20L, vec(0, 0, 1, 0)), (21L, vec(0.6, 0.6, 0.5, 0.2))
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDupRepresentatives(emb, "vec_id", "embedding", 4, 0.99)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(0L, 10L, 20L, 21L))
    // All original columns pass through for the survivors.
    val full = Similarity.semanticDupRepresentatives(emb, "vec_id", "embedding", 4, 0.99)
    assert(full.columns.toSeq === Seq("vec_id", "embedding"))
    // A threshold nothing meets keeps everything.
    assert(Similarity.semanticDupRepresentatives(emb, "vec_id", "embedding", 4, 0.999999)
      .count() === 7L)
  }

  test("text stats and language id") {
    val stats = TextAnalysis.withTextStats(docs, "text")
    val r0 = stats.filter(col("doc_id") === 0).head()
    assert(r0.getAs[Int]("token_count") === 9)
    assert(r0.getAs[String]("lang_pred") === "en")
    val r4 = stats.filter(col("doc_id") === 4).head()
    assert(r4.getAs[Int]("token_count") === 0)
    assert(r4.getAs[Double]("stopword_ratio") === 0.0)
    // fingerprint stable across formatting changes
    val fp = docs.select(TextAnalysis.fingerprint(lit("The quick,  brown FOX!")).as("a"),
      TextAnalysis.fingerprint(lit("the quick brown fox")).as("b")).head()
    assert(fp.getString(0) === fp.getString(1))
  }

  test("quality filter: each rule fires alone, reasons in order, keep is the conjunction") {
    val longText = ("the dog ran to the big red house and sat " * 3).trim // 30 toks, stopwords, mwl ~3.2
    val docs = Seq(
      (0L, longText),                                    // passes all rules
      (1L, "the cat sat"),                               // too_short (min 5 here)
      (2L, ("zzzzzzzzzzzz " * 10).trim),                 // word_len high, stopwords gone
      (3L, longText + " !!!???...,,,;;;:::!!!???...,,,;;;:::"), // punct
      (4L, Seq.fill(8)("the dog ran to the big red house").mkString("\n")), // dup_lines
      (5L, null.asInstanceOf[String])                    // empty: short+word_len+stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text",
        minTokens = 5, maxTokens = 1000, minMeanWordLen = 2.0, maxMeanWordLen = 8.0,
        maxPunctRatio = 0.1, minStopwordRatio = 0.05, maxDupLineFraction = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out(0L) === ((true, "")))
    assert(out(1L) === ((false, "too_short")))
    assert(out(2L) === ((false, "word_len,stopwords")))
    assert(out(3L) === ((false, "punct")))
    assert(out(4L) === ((false, "dup_lines")))
    assert(out(5L) === ((false, "too_short,word_len,stopwords")))
  }

  test("rolling hash: pinned golden vectors, independent reimpl, order-sensitive") {
    // q32 is now FULLY oracle-gated (the md5-polynomial definition is
    // recomputable in DuckDB — round 8); these vectors additionally pin the
    // definition against silent drift, cross-checked against an independent
    // driver-side fold: v = unsigned int of md5 digest bytes 12..15, two
    // 32-bit polynomial accumulators (bases 1000003/1000033), packed
    // (h1 mod 2^31) * 2^32 + h2.
    def independent(text: String): Long = {
      val trimmed = text.replaceAll("^ +| +$", "") // Spark trim: spaces only
      val toks = if (trimmed.isEmpty) Array.empty[String] else trimmed.split("\\s+")
      var h1 = 0L
      var h2 = 0L
      toks.foreach { t =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        val v = ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
          ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
        h1 = (h1 * 1000003L + v) & 0xffffffffL
        h2 = (h2 * 1000033L + v) & 0xffffffffL
      }
      ((h1 & 0x7fffffffL) << 32) | h2
    }
    val golden = Seq(
      "the quick brown fox" -> 7557574592762972848L,
      "fox brown quick the" -> 1419787150097858992L, // same tokens, other order
      "  padded   tokens  " -> 178894062121905373L, // trim + run collapsing
      "single" -> 7282834878537782204L,
      "" -> 0L, // no tokens -> the fold's zero element
      "a b" -> 501136450749391952L,
      "b a" -> 8022299407655186832L)
    val got = golden.map(_._1).toDF("t")
      .select(col("t"), TextAnalysis.rollingHash(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    golden.foreach { case (t, h) =>
      assert(got(t) === h, s"pinned vector drifted for '$t'")
      assert(got(t) === independent(t), s"independent chain disagrees for '$t'")
    }
    assert(got("the quick brown fox") !== got("fox brown quick the"),
      "rolling hash must be order-sensitive (unlike fingerprint)")
    val nullH = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(TextAnalysis.rollingHash(col("t"))).head()
    assert(nullH.isNullAt(0), "null text -> null hash")
  }

  test("topTokens: exact counts, deterministic tie-break, doc-frequency variant") {
    val corpus = Seq(
      (0L, "b a a c"), (1L, "a b b"), (2L, "c d"), (3L, "   "), (4L, "d c c")
    ).toDF("doc_id", "text")
    // term frequency: a=3, b=3, c=4, d=2 -> top3 = c4, then tie a/b broken by token
    val tf = TextAnalysis.topTokens(corpus, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tf === Seq(("c", 4L), ("a", 3L), ("b", 3L)))
    // doc frequency: c in docs {0,2,4}=3; a,b,d each in 2 -> tie broken by token
    val df = TextAnalysis.topTokens(corpus, "text", 2, byDocFreq = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(df === Seq(("c", 3L), ("a", 2L)))
    // plan shape: a k-heap TakeOrdered, not a global Sort+Exchange
    val plan = TextAnalysis.topTokens(corpus, "text", 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hash sampling and split assignment are deterministic and key-stable") {
    val ids = spark.range(0, 10000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplits(ids, "id", splits, salt = "s1")
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform: 80/10/10 within a few percent at n=10k
    assert(math.abs(counts("train") - 8000L) < 400, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 200, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 200, counts.toString)
    // identical assignment on a re-run and under a different partitioning
    val b = Sampling.assignSplits(ids.repartition(13), "id", splits, salt = "s1")
    assert(a.orderBy("id").collect().toSeq === b.orderBy("id").collect().toSeq)
    // different salt draws an independent assignment
    val c = Sampling.assignSplits(ids, "id", splits, salt = "s2")
    val changed = a.alias("a").join(c.alias("c"), "id")
      .filter(col("a.split") =!= col("c.split")).count()
    assert(changed > 1000, s"salt change should reassign many rows, moved $changed")
    // sampleByHash subsets are nested for growing fractions (same salt)
    val s10 = Sampling.sampleByHash(ids, "id", 0.10, "u").collect().map(_.getLong(0)).toSet
    val s25 = Sampling.sampleByHash(ids, "id", 0.25, "u").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s25))
    assert(math.abs(s25.size - 2500) < 200, s25.size.toString)
    // weight validation
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(ids, "id", Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("connected components: chain, star, disjoint, singleton-free") {
    // Both execution paths must pass the same matrix: the distributed
    // large-star/small-star rounds (localUnionFindEdges = 0 forces them)
    // and the small-graph single-task union-find (default threshold).
    for (threshold <- Seq(0L, 4L << 20)) {
      // A long chain is the adversarial case for label propagation (diameter
      // rounds); large-star/small-star must still collapse it within maxIter.
      val chain = (0L until 40L).map(i => (i + 1, i)).toDF("a", "b")
      val cc = Dedup.connectedComponents(chain, "a", "b",
        localUnionFindEdges = threshold).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc.size === 41, s"threshold=$threshold")
      assert(cc.values.toSet === Set(0L), s"threshold=$threshold")

      // Two disjoint clusters + reversed/duplicated/self edges.
      val messy = Seq((5L, 9L), (9L, 5L), (9L, 7L), (7L, 7L),
        (20L, 21L), (22L, 21L)).toDF("a", "b")
      val cc2 = Dedup.connectedComponents(messy, "a", "b",
        localUnionFindEdges = threshold).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc2 === Map(5L -> 5L, 9L -> 5L, 7L -> 5L,
        20L -> 20L, 21L -> 20L, 22L -> 20L), s"threshold=$threshold")

      // Empty pair set → empty result, no iteration blowup.
      assert(Dedup.connectedComponents(
        Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b",
        localUnionFindEdges = threshold).count() === 0, s"threshold=$threshold")

      // Ids keep their natural type: string doc-ids (hashes, URLs) cluster
      // under lexicographic min without any numeric cast.
      val strPairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c"), ("zz", "yy"))
        .toDF("a", "b")
      val cc3 = Dedup.connectedComponents(strPairs, "a", "b",
        localUnionFindEdges = threshold).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(cc3 === Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a",
        "yy" -> "yy", "zz" -> "yy"), s"threshold=$threshold")
    }
  }

  test("connected components: reliable-checkpoint path equals localCheckpoint path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val rnd = new scala.util.Random(13)
    val edges = (1 to 200).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .toDF("a", "b")
    // Forced through the distributed rounds (the only path that checkpoints).
    val local = Dedup.connectedComponents(edges, "a", "b", localUnionFindEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dirBefore = spark.sparkContext.getCheckpointDir
    val reliableDf = Dedup.connectedComponents(edges, "a", "b",
      localUnionFindEdges = 0, checkpointDir = Some(dir))
    // The global checkpoint-dir setting is restored on return (round 8) —
    // the call must not leave its own directory active on the context.
    assert(spark.sparkContext.getCheckpointDir === dirBefore,
      "connectedComponents leaked its checkpoint dir onto the SparkContext")
    // Exact restore when a dir was ALREADY set: the public setter nests a
    // fresh UUID per call, so a naive save/restore would drift one level
    // deeper; the Bridge-based restore must return the identical value.
    val preset = java.nio.file.Files.createTempDirectory("graft_cc_prev").toString
    spark.sparkContext.setCheckpointDir(preset)
    val presetResolved = spark.sparkContext.getCheckpointDir
    try {
      // separate dir: the snapshot-count assertion below audits `dir`
      val dir2 = java.nio.file.Files.createTempDirectory("graft_cc_ckpt2").toString
      Dedup.connectedComponents(edges, "a", "b",
        localUnionFindEdges = 0, checkpointDir = Some(dir2)).collect()
      assert(spark.sparkContext.getCheckpointDir === presetResolved,
        "pre-existing checkpoint dir drifted across the call")
    } finally {
      org.apache.spark.sql.graft.Bridge
        .restoreCheckpointDir(spark.sparkContext, dirBefore)
    }
    val reliable = reliableDf
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
    // The reliable path actually wrote checkpoint files, and superseded
    // rounds were deleted eagerly: only the LAST round's rdd-* snapshot may
    // remain (the returned frame reads it lazily).
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "reliable checkpoint left no files on disk")
    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-"))
      .count()
    assert(rddDirs <= 1,
      s"superseded round snapshots not cleaned up: $rddDirs rdd-* dirs remain")
  }

  test("connected components: union-find path equals distributed rounds on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = (1 to n).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .toDF("a", "b")
      val dist = Dedup.connectedComponents(edges, "a", "b", localUnionFindEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = Dedup.connectedComponents(edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist === local, s"trial=$trial")
    }
  }

  test("long-keyed dedup operators reject non-integral ids loudly") {
    // A string id would cast to null and silently dedup nothing.
    val strDocs = docs.withColumn("doc_id", concat(lit("d"), col("doc_id")))
    val ex = intercept[IllegalArgumentException] {
      Dedup.minHashDedupPairs(strDocs, "doc_id", "text", 0.9)
    }
    assert(ex.getMessage.contains("integral id"), ex.getMessage)
    intercept[IllegalArgumentException] {
      Dedup.dedupParagraphs(strDocs, "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(strDocs, "doc_id", "text", "source", 3, 0.3)
    }
  }

  test("near-dup representatives keep one row per duplicate cluster") {
    // docs: {0,1,2} one near-dup cluster (min id 0 survives), {3,4} untouched.
    val kept = Dedup.nearDupRepresentatives(docs, "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(0L, 3L, 4L))
  }

  test("corpus report: integer measures, null text counts docs only") {
    val df = Seq(
      ("a", "w w w"), // 3 tokens
      ("a", "w w w"), // exact dup of the first
      ("a", Seq.fill(25)("t").mkString(" ")), // not short
      ("b", null.asInstanceOf[String])
    ).toDF("source", "text")
    val got = TextAnalysis.corpusReport(df, "text", Seq("source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // source a: 3 docs, 3+3+25 tokens, 5+5+49 chars, 2 distinct texts,
    // 2 short (< 20 tokens)
    assert(got("a") === ((3L, 31L, 59L, 2L, 2L)))
    // null text: doc counted; token/char/distinct/short all skip it
    assert(got("b") === ((1L, 0L, 0L, 0L, 0L)))
  }

  test("token-count quantiles: exact type-1 picks, null text excluded") {
    // 10 docs with token counts 1..10 (plus a null-text doc that must not
    // count): p-permille k picks the smallest count covering ceil(k*n/1000)
    val df = ((1 to 10).map(i => Seq.fill(i)("w").mkString(" ")) :+
      null.asInstanceOf[String]).toDF("text")
    val got = TextAnalysis.tokenCountQuantiles(df, "text", Seq(100, 250, 500, 901, 1000))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n=10: ceil thresholds 1, 3, 5, 10, 10 → counts 1, 3, 5, 10, 10
    assert(got === Map(100L -> 1L, 250L -> 3L, 500L -> 5L, 901L -> 10L, 1000L -> 10L))
  }

  test("grouped token-count quantiles equal the global rule applied per group") {
    // Group g has counts 1..10, group h has counts 5..8 (plus a null-text
    // row in each, excluded). Per-group results must equal running the
    // global operator on each group's slice alone.
    val rows =
      (1 to 10).map(i => ("g", Seq.fill(i)("w").mkString(" "))) ++
      (5 to 8).map(i => ("h", Seq.fill(i)("w").mkString(" "))) ++
      Seq(("g", null.asInstanceOf[String]), ("h", null.asInstanceOf[String]))
    val df = rows.toDF("source", "text")
    val ps = Seq(250, 500, 901, 1000)
    val grouped = TextAnalysis.tokenCountQuantilesBy(df, "text", Seq("source"), ps)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (src <- Seq("g", "h")) {
      val solo = TextAnalysis.tokenCountQuantiles(
          df.filter(col("source") === src), "text", ps)
        .collect().map(r => (src, r.getLong(0)) -> r.getLong(1)).toMap
      solo.foreach { case (k, v) => assert(grouped(k) === v, s"key $k") }
    }
    assert(grouped.size === 8)
  }

  test("keep-best exact dedup: score argmax survives, ties to lowest id") {
    val corpus = Seq(
      (1L, "same text", 5L), // group A: id 3 wins on score
      (2L, "same text", 9L),
      (3L, "same text", 9L), // ...but ties with id 2 → 2 survives
      (4L, "other text", 0L), // singleton survives regardless of score
      (5L, null.asInstanceOf[String], 1L), // null-text docs group together
      (6L, null.asInstanceOf[String], 7L)
    ).toDF("id", "text", "score")
    val kept = Dedup.bestExactRepresentatives(corpus, "id", "text", col("score"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(kept === Map(
      2L -> (9L, 3L), // score 9, tie → id 2, group of 3
      4L -> (0L, 1L),
      6L -> (7L, 2L))) // null group: best score wins
    // single shuffle: the count and the ranked pick share the digest key
    val physical = Dedup.bestExactRepresentatives(corpus, "id", "text", col("score"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(physical).length === 1, physical)
  }

  test("decontaminate drops n-gram overlap with the benchmark, keeps the rest") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // shares 5-gram with bench
      (1L, "alpha beta gamma delta different tail here"), // only a 4-gram run
      (2L, "totally unrelated content in this row"),
      (3L, "short doc"), // shorter than n: never contaminated
      (4L, "ALPHA BETA GAMMA DELTA EPSILON suffix"), // case-folded match
      (5L, null.asInstanceOf[String]) // null text: never contaminated, kept on BOTH paths
    ).toDF("doc_id", "text")
    val bench = Seq("x alpha beta gamma delta epsilon y").toDF("text")
    val kept = Decontaminate.decontaminate(corpus, "doc_id", "text", bench, "text", 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 2L, 3L, 5L))
    val bad = Decontaminate.contaminatedIds(corpus, "doc_id", "text", bench, "text", 5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(bad === Seq(0L, 4L))
    // A gram table too big for the local path falls back to the join path
    // with identical results.
    val keptJoin = Decontaminate.decontaminate(
      corpus, "doc_id", "text", bench, "text", 5, maxLocalGrams = 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptJoin === kept)
    intercept[IllegalArgumentException] {
      Decontaminate.benchmarkGramTable(bench, "text", 5, maxLocalGrams = 1)
    }
  }

  test("split leakage: id-keyed splits leak duplicate content, content-keyed never do") {
    // 40 distinct texts, each duplicated under a shifted id — the classic
    // id-keyed split mistake.
    val docs = (0 until 40).flatMap(i =>
      Seq((i.toLong, s"text number $i"), (i + 1000L, s"text number $i")))
      .toDF("doc_id", "text")
    val byId = Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 0.5, "val" -> 0.5), "s")
    val leakedById = Dedup.sourceOverlapMatrix(byId, "text", "split").count()
    assert(leakedById > 0, "planted id-keyed duplicates should leak")
    // Keying the split by a content digest sends every copy of a text to
    // the same split — zero leakage by construction.
    val byContent = Sampling.assignSplits(
      docs.withColumn("ckey", md5(to_binary(col("text"), lit("utf-8")))),
      "ckey", Seq("train" -> 0.5, "val" -> 0.5), "s")
    assert(Dedup.sourceOverlapMatrix(byContent, "text", "split").count() === 0)
  }

  test("contaminationBySuite: per-suite distinct-doc counts, multi-gram docs count once") {
    val corpus = Seq(
      (0L, "a b c d e tail one"),     // hits suite x (twice via 2 grams) -> once
      (1L, "a b c d e f"),            // hits suite x
      (2L, "p q r s t other"),        // hits suite y
      (3L, "nothing shared here at all"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val bench = Seq(
      ("x", "z a b c d e tail"),      // grams incl. "a b c d e" and "b c d e tail"
      ("y", "p q r s t")
    ).toDF("suite", "text")
    val out = Decontaminate.contaminationBySuite(
        corpus, "doc_id", "text", bench, "text", "suite", 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("x" -> 2L, "y" -> 1L))
  }

  test("overlapStats counts exact distinct-gram overlap in integer permille, zero shuffle") {
    val corpus = Seq(
      (0L, "a b c d e f"),       // grams: abcde, bcdef -> 1 of 2 overlap
      (1L, "a b c d e"),         // exactly the bench gram -> 1000 permille
      (2L, "u v w x y z"),       // no overlap
      (3L, "tiny"),              // shorter than n -> 0 grams, null permille
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val bench = Seq("a b c d e").toDF("text")
    val out = Decontaminate.overlapStats(corpus, "doc_id", "text", bench, "text", 5)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val m = out.collect().map { r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toMap
    assert(m(0L) === (2, 1, Some(500L)))
    assert(m(1L) === (1, 1, Some(1000L)))
    assert(m(2L) === (2, 0, Some(0L)))
    assert(m(3L) === (0, 0, None))
    assert(m(4L) === (0, 0, None))
  }

  test("bloom decontaminate: exact-equivalent at ample m, over-drops only as m shrinks") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta different tail here"),
      (2L, "totally unrelated content in this row"),
      (3L, "short doc"),
      (4L, "ALPHA BETA GAMMA DELTA EPSILON suffix"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val bench = Seq("x alpha beta gamma delta epsilon y").toDF("text")
    def keptAt(m: Int, k: Int = 4): Seq[Long] =
      Decontaminate.bloomDecontaminate(corpus, "text", bench, "text", 5, m, k)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // With 2^17 bits and a handful of eval grams, the collision odds are
    // ~(12/131072)^4 per gram: the Bloom equals the exact operator here.
    val exact = Decontaminate.decontaminate(corpus, "doc_id", "text", bench, "text", 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptAt(1 << 17) === exact)
    // Bloom errors are one-sided: any m keeps a SUBSET of the exact kept
    // set (false positives over-drop; a contaminated doc can never return)
    for (m <- Seq(64, 256, 4096)) {
      val kept = keptAt(m)
      assert(kept.toSet.subsetOf(exact.toSet), s"m=$m kept extra docs: $kept")
      assert(kept.contains(5L), "null text can never be contaminated")
      assert(kept.contains(3L), "docs shorter than the window have no grams")
    }
    // the bitmap is positions-bounded: building from a benchmark never
    // returns more words than the bitmap size regardless of eval volume
    assert(Decontaminate.bloomBits(bench, "text", 5, 1 << 17, 4).length === (1 << 17) / 64)
  }

  test("decontaminate runs on an unbounded stream (stateless map filter)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val bench = Seq("x alpha beta gamma delta epsilon y").toDF("text")
    val cleaned = Decontaminate.decontaminate(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", bench, "text", 5)
    val q = cleaned.writeStream.format("memory")
      .queryName("decon_stream").outputMode("append").start()
    try {
      input.addData(
        (0L, "alpha beta gamma delta epsilon zeta"), // contaminated
        (1L, "totally unrelated content in this row"))
      q.processAllAvailable()
      input.addData(
        (2L, "ALPHA BETA GAMMA DELTA EPSILON suffix"), // contaminated
        (3L, "short doc"))
      q.processAllAvailable()
      val got = spark.table("decon_stream")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 3L))
    } finally q.stop()
  }

  test("quality filter runs on an unbounded stream, decisions equal the batch path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (0L, ("the dog ran to the big red house and sat " * 3).trim),
      (1L, "the cat sat"),
      (2L, null.asInstanceOf[String]))
    val input = MemoryStream[(Long, String)]
    def gate(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.qualityFilter(df, "doc_id", "text", minTokens = 5)
    val q = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qf_stream").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("qf_stream")
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
      val batch = gate(rows.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
      assert(streamed === batch)
      assert(streamed(0L)._1 === true)
      assert(streamed(1L)._1 === false)
    } finally q.stop()
  }

  test("sampleByKeyFractions: per-key rates, nested across weight changes") {
    val df = (0L until 1000L).map(i => (i, s"src${i % 2}")).toDF("id", "key")
    val kept = Sampling.sampleByKeyFractions(
      df, "key", Map("src0" -> 1.0, "src1" -> 0.2), "id", salt = "m1")
    val byKey = kept.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("src0") === 500L)
    assert(byKey("src1") > 50L && byKey("src1") < 150L) // ~100 of 500
    // Same salt, higher weight → strict superset (nested membership).
    val more = Sampling.sampleByKeyFractions(
      df, "key", Map("src0" -> 1.0, "src1" -> 0.5), "id", salt = "m1")
      .select("id").collect().map(_.getLong(0)).toSet
    val fewer = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(fewer.subsetOf(more))
    // Unlisted keys follow defaultFraction.
    assert(Sampling.sampleByKeyFractions(
      df, "key", Map.empty, "id", defaultFraction = 0.0).count() === 0L)
    intercept[IllegalArgumentException] {
      Sampling.sampleByKeyFractions(df, "key", Map("src0" -> 1.5), "id")
    }
  }

  test("isqrt is exact, including near-perfect-square adjacency") {
    for (n <- 0L to 1000L) {
      val w = Sampling.isqrt(n)
      assert(w * w <= n && (w + 1) * (w + 1) > n, s"isqrt($n) = $w")
    }
    // The doubles-would-misround band: k^2 - 1 for huge k.
    for (k <- Seq(67108864L, 94906265L, 3037000499L)) {
      assert(Sampling.isqrt(k * k) === k)
      assert(Sampling.isqrt(k * k - 1) === k - 1)
    }
    assert(Sampling.isqrt(Long.MaxValue) === 3037000499L)
  }

  test("temperature mixture: sqrt reweighting upweights small sources, nested, deterministic") {
    // src0: 1600 docs, src1: 100 docs. α = 1/2 weights 40:10, so src1's
    // keep RATE must exceed src0's by ~4x even though its volume is 16x
    // smaller; total kept ≈ half the corpus.
    val df = (0L until 1700L)
      .map(i => (i, if (i < 1600L) "src0" else "src1")).toDF("id", "key")
    val kept = Sampling.sampleByTemperature(df, "key", "id", 500, salt = "t1")
    val byKey = kept.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rate0 = byKey("src0").toDouble / 1600
    val rate1 = byKey("src1").toDouble / 100
    assert(rate1 > 2 * rate0, s"expected sqrt upweighting, got $rate0 vs $rate1")
    val total = byKey.values.sum
    assert(total > 600 && total < 1100, s"expected ~850 kept, got $total")
    // Same salt, bigger budget → nested membership; same call → identical.
    val ids = kept.select("id").collect().map(_.getLong(0)).toSet
    val more = Sampling.sampleByTemperature(df, "key", "id", 800, salt = "t1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(more))
    assert(Sampling.sampleByTemperature(df.repartition(7), "key", "id", 500, salt = "t1")
      .select("id").collect().map(_.getLong(0)).toSet === ids)
    // Null keys drop; degenerate budgets behave.
    val withNull = df.withColumn("key",
      when(col("id") === 0L, lit(null: String)).otherwise(col("key")))
    assert(!Sampling.sampleByTemperature(withNull, "key", "id", 1000, salt = "t1")
      .select("id").collect().map(_.getLong(0)).contains(0L))
    assert(Sampling.sampleByTemperature(df, "key", "id", 0).count() === 0L)
    intercept[IllegalArgumentException] {
      Sampling.sampleByTemperature(df, "key", "id", 1001)
    }
    // Content-keyed mixtures refuse loudly instead of OOMing the driver:
    // the per-key count collect is bounded by maxKeys (the cdcLedgerHashes
    // convention), and the message names the remedy.
    val refusal = intercept[IllegalArgumentException] {
      Sampling.sampleByTemperature(df, "id", "id", 500, maxKeys = 100)
    }
    assert(refusal.getMessage.contains("maxKeys"))
    // At the bound itself the call still works.
    assert(Sampling.sampleByTemperature(df, "key", "id", 500, salt = "t1",
      maxKeys = 2).select("id").collect().map(_.getLong(0)).toSet === ids)
  }

  test("temperature mixture broadcast path (>64 keys) matches driver-side thresholds") {
    val keys = 100
    val df = (0L until 5000L).map(i => (i, s"k${i % keys}")).toDF("id", "key")
    val kept = Sampling.sampleByTemperature(df, "key", "id", 500, salt = "t2")
      .select("id").collect().map(_.getLong(0)).toSet
    // Replay the arithmetic: uniform 50-doc sources, w = isqrt(50) = 7.
    val n = 5000L / keys
    val thr = (BigInt(5000L * 500 / 1000) * Sampling.isqrt(n) * 1000000 /
      (BigInt(Sampling.isqrt(n)) * keys * n)).min(BigInt(1000000)).toLong
    val expected = (0L until 5000L).filter { id =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}t2".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5hex.substring(24), 16) % 1000000 < thr
    }.toSet
    assert(kept === expected)
  }

  test("kmv distinct sketch: exact below k, calibrated above, layout-invariant") {
    import graft.functions.KmvFunctions._
    // Below k the sketch IS the distinct set: exact, duplicates ignored.
    val small = (0L until 90L).flatMap(i => Seq(i, i, i))
      .toDF("v").select(kmv_distinct(md5Hash60(col("v")), 128).as("d"))
    assert(small.head().getLong(0) === 90L)
    // Above k: 10,000 distinct values at k=256 (stderr ~6.3%) must land
    // within 4 sigma, and the estimate must be bit-identical on any
    // partition layout and under duplication (pure function of the set).
    val big = (0L until 10000L).toDF("v")
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.select(kmv_distinct(md5Hash60(col("v")), 256).as("d")).head().getLong(0)
    val e = est(big)
    assert(e > 7500 && e < 12500, s"estimate $e out of band for 10000")
    assert(est(big.repartition(17)) === e)
    assert(est(big.union(big)) === e)
    // Null hashes are skipped, not counted.
    val withNull = big.select(when(col("v") < 5000, col("v")).as("v"))
    val eNull = withNull.select(
      kmv_distinct(md5Hash60(col("v")), 256).as("d")).head().getLong(0)
    assert(eNull > 3750 && eNull < 6250, s"null-skipping estimate $eNull")
  }

  test("incremental components: stored star edges + new pairs == from-scratch") {
    // old clusters {1,2,3} and {5,6}; new pairs extend both and open {7,8}
    val oldPairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val stored = Dedup.connectedComponents(oldPairs, "id_a", "id_b")
    val newPairs = Seq((3L, 4L), (6L, 10L), (7L, 8L)).toDF("id_a", "id_b")
    val star = stored.select(col("id").as("id_a"), col("component").as("id_b"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = rows(Dedup.connectedComponents(
      star.unionByName(newPairs), "id_a", "id_b"))
    val full = rows(Dedup.connectedComponents(
      oldPairs.unionByName(newPairs), "id_a", "id_b"))
    assert(inc === full)
    assert(inc === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 5L), (6L, 5L), (10L, 5L), (7L, 7L), (8L, 7L)))
  }

  test("key concentration: exact permille shares, null keys excluded") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c") :+
      null.asInstanceOf[String]).toDF("k")
    val r = Skew.keyConcentrationReport(df, "k").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((10L, 3L, 600L, 1000L, 1800L)))
  }

  test("fk integrity: nulls, orphans, distinct orphan keys, type refusal") {
    val child = Seq(Some(1L), Some(1L), Some(2L), None, Some(9L), Some(9L))
      .toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profile.fkIntegrityReport(child, parent, "ck", "pk").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 1L, 2L, 1L)))
    intercept[IllegalArgumentException](Profile.fkIntegrityReport(
      child, Seq("1").toDF("pk"), "ck", "pk"))
  }

  test("lateness report: adjacent inversions in arrival order, exact max backstep") {
    val df = Seq(("u1", 1L, 10L), ("u1", 2L, 5L), ("u1", 3L, 7L), ("u1", 4L, 3L),
      ("u2", 1L, 1L), ("u2", 2L, 2L)) // u2 in order: no inversions
      .toDF("user", "seq", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val r = Sessionize.latenessReport(df, "user", "seq", "ts").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 2L, 5L, 333L)))
    // fully ordered input: zero inversions, zero backstep
    val ok = Sessionize.latenessReport(
      df.where(col("user") === "u2"), "user", "seq", "ts").head()
    assert((ok.getLong(1), ok.getLong(2), ok.getLong(3)) === ((0L, 0L, 0L)))
  }

  test("embedding hygiene: severity-ordered verdicts, every branch exact") {
    val rows: Seq[(Long, Array[java.lang.Float])] = Seq(
      (1L, Array[java.lang.Float](1f, 2f, 3f)),                       // ok
      (2L, null),                                                     // null_vector
      (3L, Array[java.lang.Float](1f, 2f)),                           // wrong_dim
      (4L, Array[java.lang.Float](1f, null, 3f)),                     // null_element
      (5L, Array[java.lang.Float](Float.NaN, 0f, 0f)),                // nan beats zero
      (6L, Array[java.lang.Float](Float.PositiveInfinity, 1f, 2f)),   // inf
      (7L, Array[java.lang.Float](0f, 0f, 0f)),                       // zero_norm
      (8L, Array[java.lang.Float](Float.NaN, null, 1f)))              // null_element beats nan
    val got = Similarity.embeddingHygieneFlags(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "ok", 2L -> "null_vector", 3L -> "wrong_dim",
      4L -> "null_element", 5L -> "nan", 6L -> "inf", 7L -> "zero_norm",
      8L -> "null_element"))
  }

  test("quantized rerank: exact coarse cut, candidates-only rerank, recall vs exact") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 3)
    val got = Similarity.quantizedRerankTopK(queries, emb,
        "vec_id", "vec_id", "embedding", k = 3, expand = 13)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // expand so wide the coarse stage keeps everyone -> must equal exact
    val exact = Similarity.bruteForceTopK(queries, emb,
        "vec_id", "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === exact)
    // tight expand still returns k deterministic rows per query
    val tight = Similarity.quantizedRerankTopK(queries, emb,
        "vec_id", "vec_id", "embedding", k = 3, expand = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(tight.length === 9)
    assert(tight.toSeq === Similarity.quantizedRerankTopK(queries, emb,
      "vec_id", "vec_id", "embedding", k = 3, expand = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq)
    intercept[IllegalArgumentException](Similarity.quantizedRerankTopK(
      queries, emb, "vec_id", "vec_id", "embedding", 0))
  }

  test("dedup pressure: exact counts and permille, null text groups as empty") {
    val df = Seq(
      (0L, "a", "s1"), (1L, "a", "s1"), (2L, "b", "s1"),
      (3L, "c", "s2"), (4L, null.asInstanceOf[String], "s2"),
      (5L, null.asInstanceOf[String], "s2"), (6L, "", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.dedupPressureReport(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // s2: null, null, "" share the empty digest -> 4 docs, 2 distinct
    assert(got === Set(("s1", 3L, 2L, 1L, 333L), ("s2", 4L, 2L, 2L, 500L)))
  }

  test("int8 quantization: bounded values, faithful roundtrip, zero/null safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),       // zero vector
      (3L, Array(127.0f, -127.0f, 63.5f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = df.withColumn("qz", Similarity.quantizeInt8(col("embedding")))
      .select(col("vec_id"), col("qz.scale").as("scale"), col("qz.q").as("q"),
        Similarity.dequantizeInt8(col("qz")).as("deq"),
        col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2), r.getSeq[Double](3), r.getSeq[Double](4))).toMap
    // Max-magnitude element always lands on ±127; all |q| <= 127.
    assert(out(1L)._2 === Seq(64, -127, 32, 0))
    assert(out(3L)._2(0) === 127 && out(3L)._2(1) === -127)
    assert(out.values.forall(_._2.forall(q => q >= -127 && q <= 127)))
    // Zero vector: scale 0, all-zero codes, exact roundtrip.
    assert(out(2L)._1 === 0.0 && out(2L)._2.forall(_ == 0))
    // Dequantized reconstruction within half a step of the original.
    for ((_, (scale, _, deq, v)) <- out; (d, o) <- deq.zip(v))
      assert(math.abs(d - o) <= scale / 2 + 1e-12, s"$d vs $o at scale $scale")
  }

  test("capPerKey keeps at most k per key, deterministically across layouts") {
    val df = (0L until 100L).map(i => (i, s"src${i % 4}")).toDF("id", "key")
    val kept = Sampling.capPerKey(df, "key", 10, "id", salt = "s1")
    val byKey = kept.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey.values.forall(_ === 10L) && byKey.size === 4)
    // Same winners regardless of partitioning.
    val kept2 = Sampling.capPerKey(df.repartition(7), "key", 10, "id", salt = "s1")
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      kept2.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // A different salt draws a different (but equally sized) sample.
    val kept3 = Sampling.capPerKey(df, "key", 10, "id", salt = "s2")
    assert(kept3.count() === 40L)
    assert(kept3.select("id").collect().map(_.getLong(0)).sorted.toSeq !==
      kept.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // Under-cap keys pass through whole.
    assert(Sampling.capPerKey(df, "key", 100, "id").count() === 100L)
  }

  test("near-dup keep-best: score argmax per cluster, singletons survive themselves") {
    val docs = Seq(
      // cluster {0,1,2}: exact dup texts; scores 5, 9, 9 -> id 1 wins (tie to low id)
      (0L, "alpha beta gamma delta epsilon", 5L),
      (1L, "alpha beta gamma delta epsilon", 9L),
      (2L, "alpha beta gamma delta epsilon", 9L),
      // singleton: unrelated text, survives as its own component
      (3L, "zeta eta theta iota kappa", 1L)
    ).toDF("doc_id", "text", "score")
    val out = Dedup.bestNearDupRepresentatives(docs, "doc_id", "text", 0.9, col("score"))
      .select("doc_id", "component", "cluster_size", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    assert(out.toSeq === Seq((1L, 0L, 3L, 9L), (3L, 3L, 1L, 1L)))
  }

  test("largest-remainder allocation: hand-computed seats, sums to budget exactly") {
    // strata sizes 5/3/2, budget 7: quotas 3.5/2.1/1.4 -> bases 3/2/1,
    // one leftover seat goes to the largest remainder (a, rem .5)
    val df = ((0 until 5).map(i => (i.toLong, "a")) ++
      (10 until 13).map(i => (i.toLong, "b")) ++
      (20 until 22).map(i => (i.toLong, "c"))).toDF("id", "key")
    val alloc = Sampling.proportionalAllocation(df, "key", 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(alloc === Map("a" -> (5L, 4L), "b" -> (3L, 2L), "c" -> (2L, 1L)))
    // remainder ties break by key ascending: sizes 3/3/3, budget 7 ->
    // bases 2/2/2, remainder 1/3 everywhere, seat goes to "a"
    val tied = (0 until 9).map(i => (i.toLong, s"${('a' + i % 3).toChar}"))
      .toDF("id", "key")
    val ta = Sampling.proportionalAllocation(tied, "key", 7)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ta === Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
  }

  test("weightedAllocation: weighted seats, upsampling target, zero-weight strata") {
    // sizes a=5 b=3 c=2, weights a=1 b=2 c=0, budget 7: masses 5/6/0,
    // quotas 35/11=3.18.. and 42/11=3.81.. -> bases 3/3, one leftover
    // seat to the larger remainder (b, 9/11 vs a, 2/11); c reported, 0.
    val df = ((0 until 5).map(i => (i.toLong, "a")) ++
      (10 until 13).map(i => (i.toLong, "b")) ++
      (20 until 22).map(i => (i.toLong, "c"))).toDF("id", "key")
    val got = Sampling.weightedAllocation(df, "key",
        Map("a" -> 1L, "b" -> 2L, "c" -> 0L), 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map("a" -> (5L, 1L, 3L), "b" -> (3L, 2L, 4L),
      "c" -> (2L, 0L, 0L)))
    // Upsampling: the allocation is a target, not a cap — a heavy-weight
    // small stratum draws more slots than it has rows, and the total
    // still lands on the budget exactly.
    val up = Sampling.weightedAllocation(df, "key",
        Map("a" -> 1L, "c" -> 50L), 1000)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(up("c") > 2L && up.values.sum === 1000L)
    // Strata absent from the weight map get 0; all-zero mass allocates
    // nothing rather than leaking the leftover.
    val none = Sampling.weightedAllocation(df, "key", Map.empty, 7)
      .collect().map(r => r.getLong(3)).sum
    assert(none === 0L)
  }

  test("sampleWeightedMixture: multiplicities sum to budget, repetition on upsampled strata") {
    // a=5 rows w=1, c=2 rows w=50: masses 5/100, budget 21 -> quotas 1/20
    // exactly (105/105 and 2100/105), no remainders. a keeps its single
    // salted-rank winner; c's 2 rows repeat 10x each. b (no weight) drops.
    val df = ((0 until 5).map(i => (i.toLong, "a")) ++
      (10 until 13).map(i => (i.toLong, "b")) ++
      (20 until 22).map(i => (i.toLong, "c"))).toDF("id", "key")
    val got = Sampling.sampleWeightedMixture(df, "key", "id",
      Map("a" -> 1L, "c" -> 50L), 21, salt = "s1")
    val byKey = got.groupBy("key")
      .agg(sum("multiplicity").as("m"), count(lit(1)).as("rows"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byKey === Map("a" -> (1L, 1L), "c" -> (20L, 2L)))
    assert(got.agg(sum("multiplicity")).head().getLong(0) === 21L)
    // Layout independence: identical manifest on a different partitioning.
    val again = Sampling.sampleWeightedMixture(df.repartition(7), "key", "id",
      Map("a" -> 1L, "c" -> 50L), 21, salt = "s1")
    assert(got.select("id", "multiplicity").collect().map(r =>
        (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      again.select("id", "multiplicity").collect().map(r =>
        (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("sampleProportional: exact counts per stratum, layout-independent winners") {
    val df = (0L until 120L).map(i => (i, s"k${i % 5}")).toDF("id", "key")
    val kept = Sampling.sampleProportional(df, "key", "id", 37, salt = "p1")
    assert(kept.count() === 37L)
    val byKey = kept.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5 equal strata of 24, budget 37: bases 7 (35/5... 37*24/120 = 7.4)
    // -> base 7 each, 2 leftover seats to the first two keys
    assert(byKey === Map("k0" -> 8L, "k1" -> 8L, "k2" -> 7L, "k3" -> 7L, "k4" -> 7L))
    // identical winners on a different layout; different salt, same counts
    val kept2 = Sampling.sampleProportional(df.repartition(11), "key", "id", 37, salt = "p1")
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      kept2.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    val kept3 = Sampling.sampleProportional(df, "key", "id", 37, salt = "p2")
    assert(kept3.count() === 37L)
    assert(kept3.select("id").collect().map(_.getLong(0)).sorted.toSeq !==
      kept.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("systematic PPS: exactly k draws, heavy units multi-drawn, layout-independent") {
    val df = (0L until 50L).map(i => (i, 1L + i % 7)).toDF("id", "w")
    val out = Sampling.systematicPpsSample(df, "id", "w", 20L, "s1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sum === 20L) // Σ multiplicity == k exactly
    assert(out.forall(_._3 >= 1L))
    // layout independence: identical draws on a different partitioning
    val out2 = Sampling.systematicPpsSample(df.repartition(13), "id", "w", 20L, "s1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq === out2.sortBy(_._1).toSeq)
    // a unit heavier than W/k MUST be drawn multiple times
    val skew = (Seq((999L, 1000L)) ++ (0L until 10L).map(i => (i, 1L)))
      .toDF("id", "w") // W=1010, k=10 -> step 101, heavy unit spans ~9 draws
    val heavy = Sampling.systematicPpsSample(skew, "id", "w", 10L, "s1")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(heavy(999L) >= 9L)
    assert(heavy.values.sum === 10L)
  }

  test("systematic PPS: replay of the weight-line recurrence; zero weights excluded") {
    val rows = (0L until 40L).map(i => (i, i % 5)) // some zero weights
    val df = rows.toDF("id", "w")
    val k = 12L
    // independent replay: md5-ordered weight line + ceil counting
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val line = rows.filter(_._2 > 0)
      .sortBy { case (id, _) => (md5hex(s"sx|$id"), id.toString) }
    val totalW = line.map(_._2).sum
    var cum = 0L
    val expected = line.flatMap { case (id, w) =>
      val cb = cum; cum += w
      val m = ((cb + w) * k + totalW - 1) / totalW - (cb * k + totalW - 1) / totalW
      if (m > 0) Some(id -> (w, m)) else None
    }.toMap
    val got = Sampling.systematicPpsSample(df, "id", "w", k, "sx")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    val weightOf = rows.toMap
    assert(!got.keySet.exists(id => weightOf(id) == 0L)) // zero-weight never drawn
  }

  test("largest-remainder allocation matches an independent reference on varied strata") {
    // independent reimplementation: BigInt quotas, remainder sort, top-ups
    def reference(sizes: Map[String, Long], budget: Long): Map[String, Long] = {
      val n = sizes.values.sum
      val base = sizes.map { case (k, s) => k -> (BigInt(budget) * s / n).toLong }
      val rem = sizes.map { case (k, s) => k -> (BigInt(budget) * s % n) }
      val leftover = budget - base.values.sum
      val winners = rem.toSeq.sortBy { case (k, r) => (-r, k) }.take(leftover.toInt).map(_._1).toSet
      base.map { case (k, b) => k -> (b + (if (winners(k)) 1L else 0L)) }
    }
    // varied pseudo-random strata sizes, several budgets
    val sizes = Map("a" -> 17L, "b" -> 3L, "c" -> 41L, "d" -> 9L, "e" -> 1L)
    val rows = sizes.toSeq.flatMap { case (k, n) =>
      (0L until n).map(i => (i * 31 + k.hashCode.toLong.abs % 97, k))
    }.zipWithIndex.map { case ((_, k), i) => (i.toLong, k) }
    val df = rows.toDF("id", "key")
    Seq(1L, 7L, 23L, 42L, 71L).foreach { budget =>
      val got = Sampling.proportionalAllocation(df, "key", budget)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got === reference(sizes, budget), s"budget $budget")
      assert(got.values.sum === budget, s"budget $budget must be hit exactly")
    }
  }

  test("funnel matches an independent per-user sequential scan on random event logs") {
    // independent reference: walk each user's time-sorted events with a
    // stage pointer (ties at equal ts resolved the same way min-ts does)
    def reference(ev: Seq[(Long, String, Int)], stages: Seq[String]): Seq[Long] = {
      val byUser = ev.groupBy(_._1)
      val reached = Array.fill(stages.length)(0L)
      byUser.values.foreach { es =>
        var stage = 0
        var lastT = Int.MinValue
        while (stage < stages.length) {
          val nxt = es.filter(e => e._2 == stages(stage) && e._3 >= lastT)
          if (nxt.isEmpty) stage = stages.length + 1 // dead
          else {
            lastT = nxt.map(_._3).min
            reached(stage) += 1
            stage += 1
          }
        }
      }
      reached.toSeq
    }
    val types = Seq("view", "click", "purchase", "other")
    val ev = (0 until 400).map { i =>
      val u = (i * 7919 % 37).toLong
      val t = types((i * 104729) % types.length)
      val m = (i * 15485863) % 50
      (u, t, m)
    }
    val df = ev.map { case (u, t, m) =>
      (u, t, java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00"))
    }.toDF("user_id", "event_type", "ts")
    val got = Sessionize.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val want = reference(ev, Seq("view", "click", "purchase"))
    assert(Seq(got(1), got(2), got(3)) === want)
  }

  test("expansion parallelism grows with corpus estimate, session floor at bench scale") {
    // Reads the user-pinned repartition's partition count out of the
    // logical plan. Note the occupancy probe (past the 2^21-membership
    // boundary) EXECUTES one aggregate job during plan construction; the
    // pair emission itself never runs here.
    def repartNums(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.queryExecution.logical.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
          r.optNumPartitions.getOrElse(-1)
      }
    val floor = spark.sessionState.conf.numShufflePartitions
    val docsDf = Seq((0L, "a b c"), (1L, "a b c")).toDF("doc_id", "text")
    // Tiny corpus, no hint: the session default is the floor.
    assert(repartNums(Dedup.minHashDedupPairs(docsDf, "doc_id", "text", 0.9)).max === floor)
    // A huge ESTIMATE over a tiny REAL corpus triggers the occupancy probe,
    // which measures the realized comparison volume (tiny) and keeps the
    // floor — the estimate sizes nothing once the probe has ground truth.
    val pHinted = repartNums(Dedup.minHashDedupPairs(docsDf, "doc_id", "text", 0.9,
      nHint = 100000000L)).max
    assert(pHinted === floor,
      s"hinted-but-tiny corpus should keep the measured floor: $pHinted vs $floor")
    // Past the boundary with a low-DIVERSITY corpus of DISTINCT token sets
    // (2^19 docs x 4 bands = 2^21 memberships; three shared tokens + one
    // unique token per doc, so ~(3/4)^2 of nodes share each band's
    // shared-min bucket): the probe measures ~1.7e11 within-bucket
    // signature comparisons and sizes the bucket stage from the MEASURED
    // volume, orders of magnitude above the floor. Exact duplicates no
    // longer count here — they collapse to nodes before LSH.
    val lowDiv = spark.range(1L << 19).select(col("id").as("doc_id"),
      concat(lit("s1 s2 s3 u"), col("id").cast("string")).as("text"))
    val pMeasured = repartNums(Dedup.minHashDedupPairs(lowDiv, "doc_id", "text", 0.9,
      numHashes = 8, bands = 4, nHint = 1L << 19,
      maxPairBudget = 1000000000000L)).max
    assert(pMeasured > 4096,
      s"probe should size from measured occupancy volume, got $pMeasured")
    // A duplicate-heavy corpus (64 distinct texts x 8k copies) bypasses the
    // bucket stage entirely via node collapse, but its quadratic
    // exact-duplicate output volume still counts toward the budget: the
    // probe refuses loudly on the SUM.
    val heavy = spark.range(1L << 19).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("t"), (col("id") % 64).cast("string"), lit("a")),
        concat(lit("t"), (col("id") % 64).cast("string"), lit("b")),
        concat(lit("t"), (col("id") % 64).cast("string"), lit("c"))).as("text"))
    val refusal = intercept[IllegalArgumentException] {
      Dedup.minHashDedupPairs(heavy, "doc_id", "text", 0.9,
        numHashes = 8, bands = 4, nHint = 1L << 19, maxPairBudget = 1000L)
    }
    assert(refusal.getMessage.contains("maxPairBudget"))
    assert(refusal.getMessage.contains("exact-duplicate"),
      "the within-node volume must be what trips the refusal here")
    // Same law for the sign-LSH bucket join.
    val emb = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val l0 = repartNums(Similarity.lshNearPairs(emb, "vec_id", "embedding", 2, 0.8,
      numPlanes = 16, tables = 32)).max
    val l8 = repartNums(Similarity.lshNearPairs(emb, "vec_id", "embedding", 2, 0.8,
      numPlanes = 16, tables = 32, nHint = 100000000L)).max
    assert(l0 === floor && l8 > floor, s"lsh growth: floor=$floor, no-hint=$l0, 1e8=$l8")
    // The helper itself: floor below, linear middle, capped top.
    assert(Dedup.expansionPartitions(0L, 32) === 32)
    assert(Dedup.expansionPartitions(1L << 30, 32) === 1025)
    assert(Dedup.expansionPartitions(Long.MaxValue / 4, 32) === 65536)
  }

  test("capPerKey skew thin: pathological key bounded, winners identical") {
    // One domain is 100k rows (half the crawl, the serializing case);
    // nine unskewed sources are 50 rows each. skewThinFactor pre-thins the
    // heavy key's window input to ~factor×maxPerKey rows without changing
    // a single winner anywhere (the thin keeps a prefix of the window's
    // own ascending-bucket order; everything is md5-deterministic).
    val heavyN = 100000L
    val df = spark.range(heavyN)
      .select(col("id"), lit("bighost").as("key"))
      .unionByName(spark.range(heavyN, heavyN + 450L)
        .select(col("id"), concat(lit("src"), (col("id") % 9).cast("string")).as("key")))
    val k = 10
    val plain = Sampling.capPerKey(df, "key", k, "id", salt = "s1")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val thinned = Sampling.capPerKey(df, "key", k, "id", salt = "s1", skewThinFactor = 20)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(thinned === plain, "skew thinning changed the survivors")
    assert(plain.count(_._2 == "bighost") === k)
    // The mechanism really bounds the heavy key's window input: replay the
    // thin filter — ~factor×k of the 100k heavy rows survive to the window.
    val bound = 20L * k
    val t = math.ceil(Sampling.DefaultBuckets.toDouble * bound / heavyN).toLong
    val windowInput = df.filter(col("key") === "bighost")
      .filter(Sampling.hashBucket(col("id"), Sampling.DefaultBuckets, "s1") < t)
      .count()
    assert(windowInput >= k && windowInput < 10L * bound,
      s"thinned heavy-key window input out of expected envelope: $windowInput")
    // Guardrail: a factor small enough to risk under-selection is rejected.
    intercept[IllegalArgumentException] {
      Sampling.capPerKey(df, "key", k, "id", skewThinFactor = 3)
    }
  }

  test("tfidfTopTerms: corpus-wide idf, deterministic tie-break") {
    val df = Seq((0L, "a a b"), (1L, "a c")).toDF("id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    // 'a' appears in both docs: idf = ln(2/2) = 0; 'b'/'c' in one: ln 2,
    // rounded to 6dp (the operator rounds before ranking for cross-engine
    // rank determinism).
    val ln2r = BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(
      (0L, 1, "b", ln2r), (0L, 2, "a", 0.0),
      (1L, 1, "c", ln2r), (1L, 2, "a", 0.0)))
    intercept[IllegalArgumentException] {
      TextAnalysis.tfidfTopTerms(df, "id", "text", 0)
    }
  }

  test("repetition signals: duplicate lines and top-bigram fraction") {
    val df = Seq(
      (0L, "nav\nhome\nnav\ncontent here\nnav"), // 5 lines, 3 distinct
      (1L, "clean prose line"),
      (2L, "buy now buy now buy now"), // 'buy now'/'now buy' dominate
      (3L, ""),
      (4L, "one") // single token: no bigrams
    ).toDF("id", "text")
    val out = df.select(
      col("id"),
      TextAnalysis.duplicateLineFraction(col("text")).as("dl"),
      TextAnalysis.topNgramFraction(col("text"), 2).as("tb"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(0L)._1 === 1.0 - 3.0 / 5.0)
    assert(out(1L)._1 === 0.0)
    // "buy now buy now buy now": bigrams = [buy now, now buy, buy now,
    // now buy, buy now] -> top 'buy now' 3 of 5
    assert(out(2L)._2 === 3.0 / 5.0)
    assert(out(3L) === ((0.0, 0.0)))
    assert(out(4L)._2 === 0.0)
  }

  test("redactPii replaces emails, IPs, phones and counts them") {
    val df = Seq(
      (0L, "mail bob.smith+x@corp.example.org, host 192.168.1.7, call 555-867-5309 now"),
      (1L, "no pii here at all"),
      (2L, "two mails a@b.io c@d.net and ip 10.0.0.1 and 1.2.3.4")
    ).toDF("id", "text")
    val out = df.select(
      col("id"),
      TextAnalysis.redactPii(col("text")).as("red"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.EmailPattern).as("e"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.Ipv4Pattern).as("i"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.PhonePattern).as("p"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getString(1) ===
      "mail <EMAIL>, host <IP>, call <PHONE> now")
    assert((out(0L).getInt(2), out(0L).getInt(3), out(0L).getInt(4)) === ((1, 1, 1)))
    assert(out(1L).getString(1) === "no pii here at all")
    assert((out(1L).getInt(2), out(1L).getInt(3), out(1L).getInt(4)) === ((0, 0, 0)))
    assert(out(2L).getString(1) === "two mails <EMAIL> <EMAIL> and ip <IP> and <IP>")
    assert((out(2L).getInt(2), out(2L).getInt(3)) === ((2, 2)))
  }

  test("chunkByTokens windows with overlap; short and empty docs") {
    val df = Seq(
      (0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (1L, "a b c"), // shorter than one chunk
      (2L, "") // no chunks at all
    ).toDF("id", "text")
    val rows = TextAnalysis.chunkByTokens(df, "id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    // stride 2: starts 0,2,4,6,8 for doc 0
    assert(rows.filter(_._1 == 0L) === Seq(
      (0L, 0, "t0 t1 t2 t3", 4),
      (0L, 1, "t2 t3 t4 t5", 4),
      (0L, 2, "t4 t5 t6 t7", 4),
      (0L, 3, "t6 t7 t8 t9", 4),
      (0L, 4, "t8 t9", 2)))
    assert(rows.filter(_._1 == 1L) === Seq((1L, 0, "a b c", 3), (1L, 1, "c", 1)))
    assert(!rows.exists(_._1 == 2L))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(df, "id", "text", 4, 4)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(df, "id", "text", 0)
    }
  }

  test("batched kernel features: batch-size independence, laziness-safe shape") {
    val df = docs.withColumn("payload", to_binary(col("text"), lit("utf-8")))
    def run(bs: Int) = Multimodal
      .withBatchedFeatures(df, "payload", bs, Multimodal.stubBatchKernel(6))
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b1 = run(1)
    val b3 = run(3)
    val b100 = run(100)
    assert(b1 === b3 && b3 === b100) // kernel results can't depend on batching
    assert(b1.values.forall(f => f.length == 6 && f.forall(v => v >= 0f && v < 1f)))
    assert(b1(0L) === b1(2L)) // identical payloads → identical features
    assert(b1(0L) !== b1(1L))
    // schema: all original columns + features
    val out = Multimodal.withBatchedFeatures(df, "payload", 4, Multimodal.stubBatchKernel(2))
    assert(out.columns.toSeq === df.columns.toSeq :+ "features")
    // a kernel violating the length contract fails loudly
    intercept[org.apache.spark.SparkException] {
      Multimodal.withBatchedFeatures(df, "payload", 4, _ => Seq.empty).collect()
    }
    // null payloads never reach the kernel; their rows keep a null features
    // cell and non-null rows are unaffected by null neighbors in the batch
    val withNulls = df.withColumn("payload",
      when(col("doc_id") % 2 === 0, col("payload")))
    val nullKernel: Seq[Array[Byte]] => Seq[Array[Float]] = { payloads =>
      assert(payloads.forall(_ != null), "kernel saw a null payload")
      Multimodal.stubBatchKernel(6)(payloads)
    }
    val nk = Multimodal.withBatchedFeatures(withNulls, "payload", 3, nullKernel)
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(nk.filter(_._1 % 2 != 0).values.forall(_ == null))
    assert(nk.filter(_._1 % 2 == 0).forall { case (id, f) => f === b1(id) })
  }

  test("chunkByTokens covers every token and reconstructs slices (randomized)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val chunkSize = 2 + rnd.nextInt(6)
      val overlap = rnd.nextInt(chunkSize)
      val stride = chunkSize - overlap
      val docsR = (0 until 30).map { i =>
        val n = rnd.nextInt(20)
        (i.toLong, (0 until n).map(j => s"w$j").mkString(" "))
      }
      val rows = TextAnalysis.chunkByTokens(
        docsR.toDF("id", "text"), "id", "text", chunkSize, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .groupBy(_._1)
      docsR.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val got = rows.getOrElse(id, Array.empty).sortBy(_._2)
        if (toks.isEmpty) {
          assert(got.isEmpty, s"trial=$trial id=$id")
        } else {
          val expStarts = 0 until toks.length by stride
          assert(got.length === expStarts.length, s"trial=$trial id=$id")
          got.zip(expStarts).foreach { case ((_, idx, textC, nTok), start) =>
            val exp = toks.slice(start, start + chunkSize)
            assert(idx === start / stride, s"trial=$trial id=$id")
            assert(textC === exp.mkString(" "), s"trial=$trial id=$id start=$start")
            assert(nTok === exp.length, s"trial=$trial id=$id start=$start")
          }
          // every token position covered by at least one chunk
          val covered = expStarts.flatMap(s0 => s0 until math.min(s0 + chunkSize, toks.length)).toSet
          assert(covered === toks.indices.toSet, s"trial=$trial id=$id")
        }
      }
    }
  }

  test("multimodal stub plumbing: schema and determinism") {
    val df = docs.withColumn("payload", to_binary(col("text"), lit("utf-8")))
    val out = Multimodal.withMediaColumns(df, "payload", "stub/utf8", 4)
    val r = out.filter(col("doc_id") === 0).head()
    val meta = r.getAs[Row]("meta")
    assert(meta.getAs[Int]("byte_len") === 43)
    assert(meta.getAs[String]("format") === "stub/utf8")
    val feats = r.getAs[scala.collection.Seq[Double]]("features")
    assert(feats.length === 4)
    assert(feats.forall(f => f >= 0.0 && f < 1.0))
    // identical payloads → identical features (docs 0 and 2)
    val f2 = out.filter(col("doc_id") === 2).head().getAs[scala.collection.Seq[Double]]("features")
    assert(feats === f2)
  }

  test("image codec: png/bmp encode-decode roundtrip recovers dims and color exactly") {
    for (fmt <- Seq("png", "bmp")) {
      val bytes =
        if (fmt == "png") ImageCodec.encodePng(7, 3, 0xAB12CD)
        else ImageCodec.encodeBmp(7, 3, 0xAB12CD)
      val Seq(feats) = ImageCodec.decodeKernel(Seq(bytes))
      assert(feats.toSeq === Seq(7f, 3f, 0xAB.toFloat, 0x12.toFloat, 0xCD.toFloat),
        s"$fmt roundtrip drifted: ${feats.toSeq}")
    }
    // Undecodable payloads fail loudly — silent garbage features would
    // poison downstream similarity search.
    val ex = intercept[IllegalArgumentException] {
      ImageCodec.decodeKernel(Seq("not an image".getBytes("UTF-8")))
    }
    assert(ex.getMessage.contains("not a JDK-decodable image"))
  }

  test("real image kernel through batched plumbing: batch-size independent, null-safe") {
    val imgs = spark.range(0, 40)
      .select(col("id"),
        when(col("id") % 7 === 0, lit(null).cast("binary"))
          .otherwise(udf((i: Long) => ImageCodec.encodePng(
            1 + (i % 6).toInt, 1 + (i % 4).toInt,
            ((i * 31) % (1 << 24)).toInt)).apply(col("id"))).as("payload"))
    def run(bs: Int) = Multimodal
      .withBatchedFeatures(imgs, "payload", bs, ImageCodec.decodeKernel)
      .select(col("id"), col("features"))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[Float]]("features")).map(_.toSeq))
      .toMap
    val a = run(1)
    val b = run(64)
    assert(a === b, "features must not depend on batch size")
    assert(a(0L).isEmpty && a(7L).isEmpty, "null payloads pass through as null features")
    assert(a(1L).get.take(2) === Seq(2f, 2f), "decoded dims disagree with fixture")
  }

  test("resize kernel: integer-exact dims, aspect kept, small images untouched") {
    // 8x3 scaled to longest side 4 -> (4, 3*4/8=1); solid color survives
    val big = ImageCodec.encodePng(8, 3, 0x102030)
    val Seq(resized) = ImageCodec.resizeKernel(4)(Seq(big))
    val Seq(feats) = ImageCodec.decodeKernel(Seq(resized))
    assert(feats.toSeq === Seq(4f, 1f, 0x10.toFloat, 0x20.toFloat, 0x30.toFloat))
    // within-budget payloads pass through BYTE-identical (no re-encode)
    val small = ImageCodec.encodePng(3, 4, 0xFFEEDD)
    val Seq(same) = ImageCodec.resizeKernel(4)(Seq(small))
    assert(same eq small, "already-small payload must not be re-encoded")
    // extreme aspect never collapses to zero pixels: 100x1 -> 4x1
    val line = ImageCodec.encodePng(100, 1, 0x010203)
    val Seq(thin) = ImageCodec.decodeKernel(ImageCodec.resizeKernel(4)(Seq(line)))
    assert(thin.take(2).toSeq === Seq(4f, 1f))
  }

  test("resize through batched binary plumbing: null-safe, batch-size independent") {
    val imgs = spark.range(0, 30)
      .select(col("id"),
        when(col("id") % 5 === 0, lit(null).cast("binary"))
          .otherwise(udf((i: Long) => ImageCodec.encodePng(
            1 + (i % 9).toInt, 1 + (i % 6).toInt,
            ((i * 31) % (1 << 24)).toInt)).apply(col("id"))).as("payload"))
    def run(bs: Int) = Multimodal
      .withBatchedBinary(imgs, "payload", "resized", bs, ImageCodec.resizeKernel(3))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getAs[Array[Byte]]("resized")).map(_.toSeq))
      .toMap
    val a = run(1)
    val b = run(50)
    assert(a === b, "resized bytes must not depend on batch size")
    assert(a(0L).isEmpty && a(5L).isEmpty, "null payloads stay null")
    // spot-check one: id=1 is 2x2, within budget -> identical to input
    val in1 = imgs.filter(col("id") === 1).head().getAs[Array[Byte]]("payload")
    assert(a(1L).get === in1.toSeq)
  }

  test("audio codec: WAV PCM16 encode-decode roundtrip, chunk walk, loud failures") {
    val samples = Array[Short](3, -2, 0, 5, -5, 32767, -32768)
    val bytes = AudioCodec.encodeWavPcm16(16000, samples)
    val (rate, back) = AudioCodec.decodeWavPcm16(bytes)
    assert(rate === 16000 && back.toSeq === samples.toSeq)
    // chunk walk: an unknown odd-sized chunk (with pad byte) before `data`
    // must be skipped, not break sample alignment
    val data = bytes.drop(36) // "data" + size + samples
    val fmtChunk = bytes.slice(12, 36)
    val oddChunk = "junk".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val body = fmtChunk ++ oddChunk ++ data
    val riff = "RIFF".getBytes("US-ASCII") ++
      Array[Byte]((body.length + 4).toByte, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ body
    val (rate2, back2) = AudioCodec.decodeWavPcm16(riff)
    assert(rate2 === 16000 && back2.toSeq === samples.toSeq,
      "unknown chunk with pad byte broke the walk")
    // malformed payloads fail loudly — silent garbage features would poison
    // downstream quality filtering
    val notWav = intercept[IllegalArgumentException] {
      AudioCodec.decodeWavPcm16("definitely not audio".getBytes("UTF-8"))
    }
    assert(notWav.getMessage.contains("not a WAV"))
    val stereo = bytes.clone()
    stereo(22) = 2 // channels field
    val unsupported = intercept[IllegalArgumentException] {
      AudioCodec.decodeWavPcm16(stereo)
    }
    assert(unsupported.getMessage.contains("only PCM16 mono"))
  }

  test("audio feature kernel: integer-exact energy, peak, crossings, duration") {
    // hand-computed: sum_sq = 9+4+0+25+25 = 63; peak = 5; strict sign
    // changes (3,-2) and (5,-5) = 2 (zero never crosses); 5 samples at
    // 8 kHz -> 0 ms by integer division
    val bytes = AudioCodec.encodeWavPcm16(8000, Array[Short](3, -2, 0, 5, -5))
    val Seq(row) = AudioCodec.featureKernel(Seq(bytes))
    assert(row === org.apache.spark.sql.Row(8000L, 5L, 0L, 63L, 5L, 2L),
      s"feature drift: $row")
    // duration rounds down: 12000 samples at 8 kHz = 1500 ms exactly
    val longer = AudioCodec.encodeWavPcm16(8000, Array.fill[Short](12000)(1))
    assert(AudioCodec.featureKernel(Seq(longer)).head.getLong(2) === 1500L)
  }

  test("real audio kernel through batched struct plumbing: batch-size independent, null-safe") {
    val wavs = spark.range(0, 40)
      .select(col("id"),
        when(col("id") % 6 === 0, lit(null).cast("binary"))
          .otherwise(udf((i: Long) => AudioCodec.encodeWavPcm16(
            8000 + (i % 3).toInt * 4000,
            Array.tabulate(10 + (i % 5).toInt)(j =>
              (((i * 31 + j * 17) % 65536) - 32768).toShort)))
            .apply(col("id"))).as("payload"))
    def run(bs: Int) = Multimodal
      .withBatchedStruct(wavs, "payload", "af", AudioCodec.FeatureSchema, bs,
        AudioCodec.featureKernel)
      .select(col("id"), col("af"))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getAs[org.apache.spark.sql.Row]("af")).map(_.toSeq))
      .toMap
    val a = run(1)
    val b = run(64)
    assert(a === b, "audio features must not depend on batch size")
    assert(a(0L).isEmpty && a(6L).isEmpty, "null payloads pass through as null struct")
    assert(a(1L).get.head === 12000L, "sample rate disagrees with fixture formula")
  }

  test("video container: demux roundtrip, stride sampling, loud failures") {
    val frames = Seq(
      ImageCodec.encodePng(2, 3, 0x112233),
      ImageCodec.encodePng(4, 1, 0x445566),
      ImageCodec.encodePng(1, 2, 0x778899))
    val vid = VideoCodec.encodeGfv(frames)
    val back = VideoCodec.decodeGfv(vid)
    assert(back.length === 3)
    assert(back.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq },
      "frame bytes must survive the container byte-identical")
    // stride 2 keeps frames 0 and 2
    val Seq(kept) = VideoCodec.frameSampleKernel(2)(Seq(vid))
    assert(kept.length === 2)
    assert(kept(0).toSeq == frames(0).toSeq && kept(1).toSeq == frames(2).toSeq)
    // empty container is legal (0 frames)
    assert(VideoCodec.decodeGfv(VideoCodec.encodeGfv(Seq.empty)).isEmpty)
    // malformed containers fail loudly
    val bad = intercept[IllegalArgumentException] {
      VideoCodec.decodeGfv("not a container at all!!".getBytes("UTF-8"))
    }
    assert(bad.getMessage.contains("bad magic"))
    val truncated = intercept[IllegalArgumentException] {
      VideoCodec.decodeGfv(vid.dropRight(5))
    }
    assert(truncated.getMessage.contains("corrupt GFV1"))
  }

  test("AVI container: real RIFF demux roundtrip, stride, junk tolerance, loud failures") {
    val frames = Seq(
      ImageCodec.encodeJpegGray(4, 2, 17),
      ImageCodec.encodeJpegGray(4, 2, 101),
      ImageCodec.encodeJpegGray(4, 2, 240))
    val avi = VideoCodec.encodeAviMjpeg(frames, 4, 2)
    // the envelope is a real RIFF 'AVI ' file
    assert(new String(avi.take(4), "US-ASCII") === "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") === "AVI ")
    val back = VideoCodec.decodeAviMjpeg(avi)
    assert(back.length === 3)
    assert(back.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq },
      "frame bytes must survive the container byte-identical")
    val Seq(kept) = VideoCodec.aviFrameSampleKernel(2)(Seq(avi))
    assert(kept.length === 2)
    assert(kept(0).toSeq == frames(0).toSeq && kept(1).toSeq == frames(2).toSeq)
    // a foreign writer's JUNK chunk between hdrl and movi must be skipped
    // (the walk follows declared sizes, not this writer's own layout)
    val junkAt = {
      // find the 'LIST....movi' header position
      val movi = "movi".getBytes("US-ASCII")
      (0 until avi.length - 12).find(i =>
        avi(i) == 'L' && avi(i + 1) == 'I' && avi(i + 2) == 'S' && avi(i + 3) == 'T' &&
          avi.slice(i + 8, i + 12).sameElements(movi)).get
    }
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ Array.fill[Byte](6)('x')
    val spliced = avi.take(junkAt) ++ junk ++ avi.drop(junkAt)
    // fix the RIFF size field for the inserted bytes
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + junk.length)
    val viaJunk = VideoCodec.decodeAviMjpeg(spliced)
    assert(viaJunk.length === 3 && viaJunk.head.toSeq == frames.head.toSeq)
    // malformed files fail loudly
    val notRiff = intercept[IllegalArgumentException] {
      VideoCodec.decodeAviMjpeg("definitely not a RIFF file".getBytes("UTF-8"))
    }
    assert(notRiff.getMessage.contains("RIFF"))
    val truncated = intercept[IllegalArgumentException] {
      VideoCodec.decodeAviMjpeg(avi.dropRight(20))
    }
    assert(truncated.getMessage.contains("corrupt AVI"))
  }

  test("AVI demux fuzz: mutated and truncated containers parse or fail loudly") {
    // Byte mutations can hit size fields with values near Int.MaxValue —
    // the bound checks must use long arithmetic or a wrapped comparison
    // would admit a 2 GB allocation. Accepted outcomes: a parse (the
    // mutation hit frame bytes or a skipped chunk) or
    // IllegalArgumentException — never OOM, wrap, or index errors.
    val avi = VideoCodec.encodeAviMjpeg(
      Seq(ImageCodec.encodeJpegGray(3, 2, 50), ImageCodec.encodeJpegGray(3, 2, 200)), 3, 2)
    val rnd = new scala.util.Random(12345)
    for (_ <- 0 until 1000) {
      val mutated = avi.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { VideoCodec.decodeAviMjpeg(mutated); () }
      catch { case _: IllegalArgumentException => () }
    }
    for (len <- 0 until avi.length) {
      try { VideoCodec.decodeAviMjpeg(avi.take(len)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("solid gray survives JPEG q=1.0 exactly across the fixture domain") {
    // The q69 oracle's load-bearing property: decoded mean_r/g/b == gray,
    // for EVERY gray value and every (w, h) the fixture formulas emit.
    val kernel = ImageCodec.decodeKernel
    for (g <- 0 until 256) {
      val w = 1 + g % 6
      val h = 1 + g % 3
      val Seq(f) = kernel(Seq(ImageCodec.encodeJpegGray(w, h, g)))
      assert(f(0) === w.toFloat && f(1) === h.toFloat)
      assert(f(2) === g.toFloat && f(3) === g.toFloat && f(4) === g.toFloat,
        s"gray $g did not survive JPEG at ${w}x$h: got (${f(2)}, ${f(3)}, ${f(4)})")
    }
  }

  test("frame sampling through batched plumbing + real per-frame decode") {
    val vids = spark.range(0, 24)
      .select(col("id"),
        when(col("id") % 8 === 0, lit(null).cast("binary"))
          .otherwise(udf((i: Long) => VideoCodec.encodeGfv(
            (0 until (1 + (i % 3).toInt)).map(k =>
              ImageCodec.encodePng(1 + k, 2, ((i * 31 + k) % (1 << 24)).toInt))))
            .apply(col("id"))).as("payload"))
    def run(bs: Int) = Multimodal
      .withBatchedFrames(vids, "payload", "frames", bs, VideoCodec.frameSampleKernel(2))
      .select(col("id"), col("frames"))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[Array[Byte]]]("frames"))
          .map(_.map(_.toSeq)))
      .toMap
    val a = run(1)
    val b = run(64)
    assert(a === b, "sampled frames must not depend on batch size")
    assert(a(0L).isEmpty && a(8L).isEmpty, "null payloads stay null")
    // id=2 has 3 frames, stride 2 keeps 0 and 2; decode the kept frames
    assert(a(2L).get.length === 2)
    val dims = ImageCodec.decodeKernel(a(2L).get.toSeq.map(_.toArray))
      .map(_.take(2).toSeq)
    assert(dims === Seq(Seq(1f, 2f), Seq(3f, 2f)),
      s"kept-frame dims disagree with fixture: $dims")
  }

  test("binary parser fuzz: corrupt WAV/GFV1 payloads fail cleanly, never hang") {
    // At corpus scale some payloads WILL be truncated or bit-flipped; the
    // parsers must either decode (flips inside sample data are undetectable
    // without checksums, by design) or throw the documented
    // IllegalArgumentException — anything else (hang, OOM, array error)
    // would kill a 100k-task job on one bad file.
    val rnd = new scala.util.Random(42)
    val wav = AudioCodec.encodeWavPcm16(16000,
      Array.tabulate(64)(i => (i * 7 - 200).toShort))
    val vid = VideoCodec.encodeGfv(Seq(
      ImageCodec.encodePng(3, 2, 0xABCDEF), ImageCodec.encodePng(1, 4, 0x0F0F0F)))
    def corrupt(base: Array[Byte]): Array[Byte] = rnd.nextInt(3) match {
      case 0 => base.take(rnd.nextInt(base.length)) // truncate
      case 1 => // flip 1-4 bytes anywhere (header or data)
        val b = base.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        b
      case 2 => Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte) // garbage
    }
    (1 to 500).foreach { i =>
      try { AudioCodec.decodeWavPcm16(corrupt(wav)); () }
      catch { case _: IllegalArgumentException => () }
      try { VideoCodec.decodeGfv(corrupt(vid)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
