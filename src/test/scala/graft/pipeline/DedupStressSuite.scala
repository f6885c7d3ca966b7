package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

/** Marker for long-running stress tests: `sbt "Test/testOnly -- -l graft.SlowTest"` excludes them. */
object SlowTest extends Tag("graft.SlowTest")

/**
 * Bench-scale degenerate-corpus stress for the dedup paths: the 2k-identical
 * spec in PipelineSuite proves the skew *design*; these runs prove it at
 * real volume — 100k+ documents that are ALL duplicates of something.
 *
 * Note the arithmetic governing the extreme case: a corpus of n mutually
 * identical docs has C(n,2) true pairs, so "100k identical docs" as ONE
 * group is a 5×10⁹-row answer — unrepresentable as a test on any engine.
 * Real duplicate-heavy corpora are many heavy groups, which is what the
 * volume test models; the single-group test takes one group as deep as the
 * answer size allows and proves the lazy emission path stays bounded.
 */
class DedupStressSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 334 groups × 300 identical docs = 100,200 docs; disjoint token sets
  // across groups so the exact answer is within-group pairs only.
  private val groupSize = 300
  private val groups = 334
  private lazy val grouped = spark.range(groups.toLong * groupSize)
    .select(col("id").as("doc_id"),
      concat(lit("group "), (col("id") % groups).cast("string"),
        lit(" body token"), (col("id") % groups).cast("string"),
        lit(" filler"), (col("id") % groups).cast("string"),
        lit(" tail"), (col("id") % groups).cast("string")).as("text"),
      lit("s").as("source"))
  private val expectedPairs =
    groups.toLong * (groupSize.toLong * (groupSize - 1) / 2)

  test("minhash: 100k all-duplicate docs, exact pair count, bounded time", SlowTest) {
    val t0 = System.nanoTime()
    val cnt = Dedup.minHashDedupPairs(grouped, "doc_id", "text", 0.9).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"minhash 100k-doc all-dup stress: $cnt%d pairs in $secs%.1f s")
    assert(cnt === expectedPairs)
    assert(secs < 600.0, f"blew the wall-time bound: $secs%.1f s")
  }

  test("adaptive MinHash banding: occupancy-driving candidate mass bounded at 10x growth") {
    // Below 2^20 docs the solve lands on the measured default exactly —
    // every existing gate and persisted index generation is unchanged.
    assert(Dedup.minHashParams(0L, 0.9) === ((128, 32)))
    assert(Dedup.minHashParams(1L << 20, 0.9) === ((128, 32)))
    // Beyond, rows-per-band grows one per doubling (the log N rule) and
    // bands re-solve the 1e-12 recall bar at the threshold.
    // (0.8 stops at 2^27: past that the solve exceeds maxHashes and
    // refuses — the loud-refusal branch asserted below)
    for (shift <- 21 to 30; t <- Seq(0.8, 0.9) if t > 0.85 || shift <= 27) {
      val n = 1L << shift
      val (nh, b) = Dedup.minHashParams(n, t)
      val r = nh / b
      assert(r === 4 + (shift - 20), s"rows-per-band at n=2^$shift")
      assert(nh % b === 0)
      // recall bar holds: P(miss a pair AT the threshold) <= 1e-12
      assert(math.pow(1.0 - math.pow(t, r), b) <= 1e-12, s"recall at n=2^$shift t=$t")
    }
    // The scale claim itself: a sub-threshold pair's candidate probability
    // (~bands * s^r — what drives bucket occupancy and verification volume)
    // DROPS >= 5x per 10x corpus growth, so total candidate volume grows
    // at most ~2x while the corpus grows 10x. Fixed banding would grow it 100x.
    for (n <- Seq(1L << 21, 1L << 24, 1L << 27); s <- Seq(0.3, 0.5)) {
      def candMass(nn: Long): Double = {
        val (nh, b) = Dedup.minHashParams(nn, 0.9)
        b * math.pow(s, nh / b)
      }
      assert(candMass(10 * n) <= candMass(n) / 5.0,
        s"candidate mass must shrink >= 5x at 10x growth (n=$n, s=$s)")
    }
    // End-to-end through the auto path: a forced big-corpus nHint picks the
    // deeper banding and the planted exact-duplicate pair still surfaces.
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zz yy xx ww")).toDF("doc_id", "text")
    val pairs = Dedup.minHashDedupPairs(docs, "doc_id", "text", 0.9, nHint = 1L << 24)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
    // Un-holdable recall bars refuse loudly instead of silently degrading...
    intercept[IllegalArgumentException](Dedup.minHashParams(1L << 30, 0.5))
    // ...and a lone override (curve half-pinned) is refused too.
    intercept[IllegalArgumentException](
      Dedup.minHashDedupPairs(docs, "doc_id", "text", 0.9, numHashes = 128))
  }

  test("resolveBandingCount: stats ride below the guard band, zero jobs") {
    // Range carries an exact rowCount in plan stats — far below the 2^19
    // guard band, the hybrid sizing must take it WITHOUT running a job
    // (the count pass is what the round-13 q24 regression paid).
    val df = spark.range(1000).toDF("id")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = Dedup.resolveBandingCount(df, 0L)
      // listener events are async — a launched job would surface within
      // this window, and the assertion is on ZERO events anyway
      Thread.sleep(500)
      assert(n === 1000L)
      assert(jobs === 0, "stats path must not launch a count job")
    } finally spark.sparkContext.removeSparkListener(listener)
    // nHint wins outright; any count below the cutover lands on the same
    // (128, 32) banding an exact count picks — the flat-curve guarantee
    // the guard band rides on.
    assert(Dedup.resolveBandingCount(df, 42L) === 42L)
    assert(Dedup.minHashParams(1000L, 0.9) ===
      Dedup.minHashParams((1L << 19) - 1, 0.9))
  }

  test("ngram jaccard: 100k all-duplicate docs, exact pair count, bounded time", SlowTest) {
    val t0 = System.nanoTime()
    val cnt = Dedup.ngramJaccardPairs(grouped, "doc_id", "text", "source", 3, 0.3).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"ngram 100k-doc all-dup stress: $cnt%d pairs in $secs%.1f s")
    assert(cnt === expectedPairs)
    assert(secs < 600.0, f"blew the wall-time bound: $secs%.1f s")
  }

  test("connected components: 334 heavy cliques collapse in few rounds", SlowTest) {
    // The adversarial input for clustering is the clique: every group of 300
    // identical docs contributes C(300,2) = 44,850 edges that must all
    // collapse onto one root. 334 such cliques ≈ 15M edges total.
    val t0 = System.nanoTime()
    val pairs = Dedup.minHashDedupPairs(grouped, "doc_id", "text", 0.9)
      .select("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val comps = cc.groupBy("component").count()
    val sizes = comps.select("count").distinct().collect().map(_.getLong(0)).toSeq
    val nComps = comps.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"cc 100k-doc clique stress: $nComps%d components in $secs%.1f s")
    assert(nComps === groups.toLong)
    assert(sizes === Seq(groupSize.toLong), s"every clique must be one full component: $sizes")
    assert(secs < 600.0, f"blew the wall-time bound: $secs%.1f s")
  }

  test("simhash: 100k all-duplicate docs, exact pair count, bounded time", SlowTest) {
    // Identical docs collapse to one sketch per group BEFORE the chunk
    // join, so the pigeonhole join sees 334 distinct sketches — not 100k
    // rows × 4 chunks — and every true pair (hamming 0) streams from the
    // group expansion. Disjoint token sets across groups keep cross-group
    // hamming far above 3, so the expected answer is exactly the
    // within-group pairs.
    val t0 = System.nanoTime()
    val out = Dedup.simHashDedupPairs(grouped, "doc_id", "text", 3)
    val (cnt, maxH) = {
      val r = out.agg(count(lit(1)), max(col("hamming"))).head()
      (r.getLong(0), r.getInt(1))
    }
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"simhash 100k-doc all-dup stress: $cnt%d pairs in $secs%.1f s")
    assert(cnt === expectedPairs)
    assert(maxH === 0, "all-duplicate groups must pair at hamming 0")
    assert(secs < 600.0, f"blew the wall-time bound: $secs%.1f s")
  }

  test("simhash 128-bit: 100k all-duplicate docs, exact pair count, bounded time", SlowTest) {
    // The wider sketch runs the identical collapse-first machinery over two
    // words (8 pigeonhole chunks, radius up to 7) — the duplicate-heavy
    // degenerate case must stay exactly as bounded as the 64-bit path.
    val t0 = System.nanoTime()
    val out = Dedup.simHashDedupPairs(grouped, "doc_id", "text", 7, bits = 128)
    val (cnt, maxH) = {
      val r = out.agg(count(lit(1)), max(col("hamming"))).head()
      (r.getLong(0), r.getInt(1))
    }
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"simhash128 100k-doc all-dup stress: $cnt%d pairs in $secs%.1f s")
    assert(cnt === expectedPairs)
    assert(maxH === 0, "all-duplicate groups must pair at hamming 0")
    assert(secs < 600.0, f"blew the wall-time bound: $secs%.1f s")
  }

  test("simhash: one 20k-identical-doc group streams its 2x10^8-pair answer", SlowTest) {
    val n = 20000
    val degen = spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        lit("all work and no play makes jack a dull boy").as("text"))
    val t0 = System.nanoTime()
    val cnt = Dedup.simHashDedupPairs(degen, "doc_id", "text", 3).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"simhash 20k single-group stress: $cnt%d pairs in $secs%.1f s")
    assert(cnt === n.toLong * (n - 1) / 2)
    assert(secs < 600.0, f"blew the wall-time bound: $secs%.1f s")
  }

  test("minhash: one 20k-identical-doc group streams its 2x10^8-pair answer", SlowTest) {
    val n = 20000
    val degen = spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        lit("all work and no play makes jack a dull boy").as("text"))
    val t0 = System.nanoTime()
    val cnt = Dedup.minHashDedupPairs(degen, "doc_id", "text", 0.9).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"minhash 20k single-group stress: $cnt%d pairs in $secs%.1f s")
    assert(cnt === n.toLong * (n - 1) / 2)
    assert(secs < 600.0, f"blew the wall-time bound: $secs%.1f s")
  }

  test("decontaminate: 100k docs vs 10k-doc eval set, exact drops, bounded time", SlowTest) {
    // Every doc's token set is unique (per-doc suffixes), so its 5-grams
    // collide with the eval set iff the doc IS an eval doc — the expected
    // survivor set is exact. 10k eval docs ≈ 20k distinct gram hashes in
    // the broadcast table; the corpus side must stay one map-side filter.
    val n = 100000L
    val corpus = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("a"), col("id")), concat(lit("b"), col("id")),
        concat(lit("c"), col("id")), concat(lit("d"), col("id")),
        concat(lit("e"), col("id")), concat(lit("f"), col("id"))).as("text"))
    val bench = corpus.filter(col("doc_id") % 10 === 0).select(col("text"))
    val t0 = System.nanoTime()
    val kept = Decontaminate.decontaminate(corpus, "doc_id", "text", bench, "text", 5)
    val (cnt, minKept) = {
      val r = kept.agg(count(lit(1)), min(col("doc_id") % 10)).head()
      (r.getLong(0), r.getLong(1))
    }
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"decontaminate 100k-doc stress: $cnt%d survivors in $secs%.1f s")
    assert(cnt === n - n / 10)
    assert(minKept >= 1L) // every eval doc dropped, nothing else
    assert(secs < 300.0, f"blew the wall-time bound: $secs%.1f s")
  }

  test("span ops: 100k docs sharing one boilerplate prefix, exact cuts, bounded time", SlowTest) {
    // The worst skew shape for the dup-gram decision: each of the 4
    // boilerplate 5-grams occurs in EVERY doc, so without the map-side
    // partial min/max one reducer would absorb 100k rows per gram.
    // 8 boilerplate tokens + 6 unique-per-doc tail tokens: grams fully
    // inside the prefix (starts 0-3) are corpus-wide dups; every gram
    // touching the tail is unique. Covered span per doc = tokens [0, 8).
    val n = 100000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        Seq("h1", "h2", "h3", "h4", "h5", "h6", "h7", "h8").map(lit(_)) ++
          Seq("a", "b", "c", "d", "e", "f")
            .map(p => concat(lit(p), col("id"))): _*).as("text"))
    val t0 = System.nanoTime()
    val cov = Dedup.duplicateSpanCoverage(docs, "doc_id", "text", 5)
      .agg(count(lit(1)), sum(col("dup_tokens")),
        min(col("dup_frac")), max(col("dup_frac"))).head()
    val covSecs = (System.nanoTime() - t0) / 1e9
    assert(cov.getLong(0) === n)
    assert(cov.getLong(1) === 8L * n)
    assert(cov.getDouble(2) === cov.getDouble(3), "uniform corpus, uniform fraction")
    val t1 = System.nanoTime()
    val cut = Dedup.removeDuplicateSpans(docs, "doc_id", "text", 5)
      .agg(count(lit(1)),
        sum(size(split(col("cleaned"), " "))).as("toks")).head()
    val cutSecs = (System.nanoTime() - t1) / 1e9
    assert(cut.getLong(0) === n)
    assert(cut.getLong(1) === 6L * n, "exactly the unique tails survive")
    info(f"span stress: coverage $covSecs%.1f s, removal $cutSecs%.1f s over $n%d docs")
    assert(covSecs < 300.0 && cutSecs < 300.0,
      f"blew the wall-time bound: $covSecs%.1f / $cutSecs%.1f s")
  }

  test("packing: 200k docs in ONE shard stream through the sorted-group scan", SlowTest) {
    // The degenerate parallelism case: a single shard forces one task to
    // scan every row. The design claim is O(one sequence) task state — this
    // proves it at volume: 200k × 9-token docs → 2M tokens → 20k full
    // sequences at budget 100 (9 docs × 9 + the 10th overflows ... exactly:
    // floor(100/9)=11 docs per sequence, 200000/11 = 18182 sequences), plus
    // materialized text per sequence, without task-memory blowup.
    val n = 200000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 9).map(i => concat(lit(s"t$i"), col("id") % 100)): _*)
        .as("text"),
      lit("one-shard").as("source"))
    val t0 = System.nanoTime()
    val agg = Packing.packSequences(docs, "doc_id", "text", "source", 100)
      .agg(count(lit(1)).as("seqs"), sum("n_tokens").as("toks"),
        sum("n_docs").as("docs"), max("n_tokens").as("maxTok")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"packSequences 1-shard stress: ${agg.getLong(0)}%d seqs in $secs%.1f s")
    assert(agg.getLong(0) === (n + 10) / 11) // ceil(200000/11) sequences
    assert(agg.getLong(1) === 9L * n) // every token lands exactly once
    assert(agg.getLong(2) === n)
    assert(agg.getLong(3) === 99L) // 11 × 9 tokens — never over budget
    assert(secs < 300.0, f"blew the wall-time bound: $secs%.1f s")
  }
}
