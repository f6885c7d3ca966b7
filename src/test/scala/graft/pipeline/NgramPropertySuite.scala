package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

/**
 * Equivalence properties the native gram path depends on:
 *
 *  1. `HashedNgrams` must induce the same gram-set EQUALITY semantics as the
 *     higher-order-function formulation (`split(trim(text), "\s+")` →
 *     distinct n-gram strings): same set sizes, same intersections — the
 *     hashes differ, Jaccard values must not.
 *  2. The prefix-filtered similarity join must return exactly the quadratic
 *     join's pairs on randomized corpora (perfect recall of the prefix
 *     filter, not just on the fixture corpus).
 */
class NgramPropertySuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(0xbeef)
  // Multi-byte UTF-8 tokens included on purpose: the native byte-scan
  // tokenizers claim byte scanning is safe because no UTF-8 continuation
  // byte is ASCII whitespace — these make the property tests prove it.
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy",
    "z9", "the", "of", "héllo", "日本語", "emoji🙂ok", "ñandú")

  private def randomDoc(): String = {
    val n = rnd.nextInt(12)
    val seps = Vector(" ", "  ", "\t", "\n", " \t ")
    val sb = new StringBuilder
    // adversarial leading/trailing whitespace mixes
    if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.length)))
    (0 until n).foreach { i =>
      if (i > 0) sb.append(seps(rnd.nextInt(seps.length)))
      sb.append(vocab(rnd.nextInt(vocab.length)))
    }
    if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.length)))
    sb.toString
  }

  test("native band hashes are value-identical to the HOF formulation") {
    import graft.functions.SketchFunctions
    val bands = 32
    val r = 4
    val docs = (0 until 300).map(i => (i.toLong, randomDoc())).toDF("id", "text")
    val sigs = docs.select(col("id"),
      SketchFunctions.minhash_signature(
        SketchFunctions.hashed_ngrams(col("text"), 1), bands * r).as("sig"))
    val hof = transform(sequence(lit(0), lit(bands - 1)),
      i => xxhash64(slice(col("sig"), i * r + 1, lit(r))))
    val mismatches = sigs
      .select(SketchFunctions.minhash_band_hashes(col("sig"), bands).as("native"),
        hof.as("hof"))
      .filter(not(col("native") === col("hof")))
      .count()
    assert(mismatches === 0)
  }

  test("band hashes of a NULL signature: native is null, HOF is seed hashes") {
    // The documented divergence: the null-intolerant native expression
    // propagates null, while the HOF hashes bands of an all-null slice to
    // the xxhash64 seed (42). Locks the contract stated in the scaladoc.
    import graft.functions.SketchFunctions
    val bands = 4
    val row = Seq(Tuple1(Option.empty[Array[Long]])).toDF("sig")
    val hof = transform(sequence(lit(0), lit(bands - 1)),
      i => xxhash64(slice(col("sig"), i * 2 + 1, lit(2))))
    val out = row.select(
      SketchFunctions.minhash_band_hashes(col("sig"), bands).as("native"),
      hof.as("hof")).head()
    assert(out.isNullAt(0), "native band hashes of a null signature must be null")
    assert(out.getSeq[Long](1) === Seq.fill(bands)(42L))
  }

  test("hashed n-gram sets match the HOF formulation's sizes and overlaps") {
    for (n <- Seq(1, 2, 3)) {
      val docs = (0 until 200).map(i => (i.toLong, randomDoc())).toDF("id", "text")
      // HOF reference: distinct n-gram strings of split(trim(text), "\s+")
      val toks = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
        .otherwise(split(trim(col("text")), "\\s+"))
      val hofGrams = array_distinct(
        when(size(toks) < n, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      val both = docs.select(col("id"),
        size(Dedup.hashedNgramSet(col("text"), n)).as("native_sz"),
        size(hofGrams).as("hof_sz"))
      val mismatch = both.filter(col("native_sz") =!= col("hof_sz")).count()
      assert(mismatch === 0, s"n=$n gram-set size mismatch")

      // pairwise intersection sizes must also agree (equality semantics):
      // compare native sorted-hash Jaccard against string-set Jaccard.
      val g = docs.select(col("id"),
        Dedup.hashedNgramSet(col("text"), n).as("ng"), hofGrams.as("sg"))
      val pairs = g.as("l").join(g.as("r"), col("l.id") < col("r.id"))
        .select(
          graft.functions.SketchFunctions.sorted_long_jaccard(col("l.ng"), col("r.ng")).as("jn"),
          graft.functions.SketchFunctions.array_jaccard(col("l.sg"), col("r.sg")).as("js"))
      val bad = pairs.filter(abs(col("jn") - col("js")) > 1e-12).count()
      assert(bad === 0, s"n=$n Jaccard disagreement between native and HOF gram sets")
    }
  }

  test("prefix-filtered join equals quadratic join on randomized corpora") {
    for (trial <- 0 until 3) {
      val docs = (0 until 120).map { i =>
        val blk = s"s${i % 3}"
        (i.toLong, randomDoc(), blk)
      }.toDF("doc_id", "text", "source")
      for (t <- Seq(0.2, 0.5, 0.8)) {
        def pairSet(df: org.apache.spark.sql.DataFrame) =
          df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val pre = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 2, t))
        val quad = pairSet(Dedup.ngramJaccardPairsQuadratic(docs, "doc_id", "text", "source", 2, t))
        assert(pre === quad, s"trial=$trial t=$t: prefix ${pre.size} vs quad ${quad.size}")
      }
    }
  }

  test("gram_stats equals the HOF gram-multiset formulation on random text") {
    import graft.functions.SketchFunctions
    for (n <- Seq(1, 2, 3)) {
      val docs = (0 until 400).map(i => (i.toLong, randomDoc())).toDF("id", "text")
      // HOF reference: string n-grams WITH duplicates; total = count, max =
      // highest multiplicity (via sort + an aggregate run-length fold).
      val toks = TextAnalysis.tokens(col("text"))
      val grams = when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
      val sorted = array_sort(grams)
      val maxRun = when(size(sorted) === 0, lit(0)).otherwise(
        aggregate(sorted, struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
          (acc, g) => {
            val run = when(g === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
            struct(g.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best")))
      val mismatches = docs.select(
          SketchFunctions.gram_stats(col("text"), n).as("gs"),
          size(grams).as("hof_total"), maxRun.as("hof_max"))
        .filter(col("gs.total_grams") =!= col("hof_total") ||
          col("gs.max_gram_count") =!= col("hof_max"))
        .count()
      assert(mismatches === 0, s"n=$n")
    }
  }

  test("any_in_long_set equals arrays_overlap against the same literal set") {
    import graft.functions.SketchFunctions
    val docs = (0 until 400).map(i => (i.toLong, randomDoc())).toDF("id", "text")
    val table = Decontaminate.benchmarkGramTable(
      docs.filter(col("id") % 7 === 0), "text", 2)
    val native = SketchFunctions.any_in_long_set(
      Decontaminate.hashedGrams(col("text"), 2), table)
    val hof = arrays_overlap(
      Decontaminate.hashedGrams(col("text"), 2),
      typedLit(table))
    val mismatches = docs.select(native.as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(mismatches === 0)
  }
}
