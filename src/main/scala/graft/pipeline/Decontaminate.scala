package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, functions => F}

import graft.functions.SketchFunctions

/**
 * Benchmark decontamination: remove training documents that share any word
 * n-gram with a held-out evaluation set, the standard pretraining hygiene
 * pass (GPT-3 appendix C / PaLM-style 8-gram overlap).
 *
 * Shape at 100 TB: the corpus side is the 100 TB; the benchmark side is a
 * few MB of eval sets. So the corpus must never shuffle by gram — and with
 * an eval set that fits executor memory (the overwhelmingly common case)
 * it never shuffles at all: the eval set's distinct gram hashes are pulled
 * once into a sorted long array that rides to every task with the plan,
 * and each document is one map-side membership test
 * ([[graft.functions.AnyInLongSet]]) — the executor-local Bloom-filter
 * pattern, but exact. Zero shuffles, zero joins, streaming-safe. Above
 * `maxLocalGrams` the operator falls back to a broadcast semi-join on the
 * exploded gram hashes (still never shuffling the corpus by gram; only
 * matched ids reach an exchange).
 *
 * Grams are compared as 64-bit `xxhash64` values ([[graft.functions
 * .SketchExpressions HashedNgrams]]: one byte pass per document —
 * tokenize, hash, slide — measured 20-30× the interpreted
 * `transform`+`slice`+`array_join` chain, and corpus-side gram CPU is the
 * term that scales with the 100 TB). The tradeoff is one-sided: a hash
 * collision can only OVER-drop (an innocent document matching an eval
 * gram's hash), never keep a contaminated one, and the expected number of
 * false drops is |corpus grams| × |eval grams| / 2⁶⁴ — ~5·10⁻⁴ documents
 * at 10¹⁰ corpus grams × 10⁶ eval grams. [[wordGrams]] exposes the exact
 * string grams for audits of specific documents.
 */
object Decontaminate {

  /** Eval-set gram-table size (distinct hashes) up to which the zero-shuffle
   *  map-filter path is used: 16M grams = a 128 MB sorted array, shipped
   *  once per executor inside the broadcast task binary — and
   *  GLUE/MMLU/HumanEval-style eval suites are thousands of times smaller
   *  still. */
  val MaxLocalGramsDefault: Int = 16 << 20

  /** Distinct lowercased word n-grams of `text` as strings (exact audit
   *  path; the operator itself matches on [[hashedGrams]]); fewer than `n`
   *  tokens → empty array (a document shorter than the window can't be
   *  contaminated by it). */
  def wordGrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = TextAnalysis.tokens(lower(text))
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(F.slice(toks, i + 1, lit(n)), " "))))
  }

  /** Distinct (sorted) hashed lowercased word n-grams — value-equivalent to
   *  hashing each [[wordGrams]] entry's token sequence, but one byte pass,
   *  no per-gram string materialization. */
  def hashedGrams(text: Column, n: Int): Column =
    SketchFunctions.hashed_ngrams(lower(text), n)

  /** The eval set's distinct gram hashes as a sorted array, pulled to the
   *  driver once. Bounded by construction: this is the *benchmark* side.
   *  Fails loudly past `maxLocalGrams` rather than silently assembling a
   *  driver-crushing array — callers with a pathological "benchmark" that
   *  big should use the join-path operators directly. */
  def benchmarkGramTable(
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int,
      maxLocalGrams: Int = MaxLocalGramsDefault): Array[Long] =
    collectGramTable(benchmark, benchTextCol, n, maxLocalGrams).getOrElse {
      throw new IllegalArgumentException(
        s"benchmark produced more than $maxLocalGrams distinct $n-grams; " +
          "raise maxLocalGrams or use contaminatedIds/decontaminate's join path")
    }

  /** None ⇔ the distinct gram count exceeds `maxLocalGrams` (checked with a
   *  limit, so an oversized eval set never materializes on the driver). */
  private def collectGramTable(
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int,
      maxLocalGrams: Int): Option[Array[Long]] = {
    // Primitive collect (Dataset[Long] → Array[Long]), not collect() of
    // Rows: at the millions-of-grams scale, boxing one Row per gram would
    // cost the driver far more transient heap than the table itself.
    val arr = benchmark
      .select(explode(hashedGrams(col(benchTextCol), n)).as("gram"))
      .distinct()
      .limit(maxLocalGrams + 1)
      .select(col("gram"))
      .as(org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    if (arr.length > maxLocalGrams) None
    else {
      java.util.Arrays.sort(arr)
      Some(arr)
    }
  }

  /** Predicate: does `text` share any n-gram with the (pre-collected) eval
   *  gram table? Pure map-side expression — usable in batch filters and
   *  unbounded streaming queries alike (no state, no shuffle). */
  def isContaminated(text: Column, gramTable: Array[Long], n: Int): Column =
    SketchFunctions.any_in_long_set(hashedGrams(text, n), gramTable)

  /** Ids of `df` documents sharing at least one word n-gram with
   *  `benchmark`. One distinct-aggregation shuffle over matched ids only
   *  (join path — works for any benchmark size). */
  def contaminatedIds(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8): DataFrame = {
    val benchGrams = broadcast(
      benchmark
        .select(explode(hashedGrams(col(benchTextCol), n)).as("gram"))
        .distinct())
    df.select(col(idCol), explode(hashedGrams(col(textCol), n)).as("gram"))
      .join(benchGrams, Seq("gram"), "left_semi")
      .select(idCol)
      .distinct()
  }

  /**
   * Bloom-filter variant of the eval-set bitmap: the benchmark's grams set
   * `k` md5-derived bits each in an `mBits`-bit map, and a document is
   * dropped iff any of its grams finds ALL its `k` bits set. The contract
   * difference from [[decontaminate]]'s exact table: state is a FIXED
   * `mBits/8` bytes no matter how large the benchmark grows (the exact
   * table grows 8 bytes per distinct gram), at the price of a tunable
   * false-positive rate ≈ (1 − e^(−k·|grams|/mBits))^k — and Bloom errors
   * only ever OVER-drop, never keep a contaminated document, the safe
   * direction for training hygiene. Build never collects grams: only the
   * DISTINCT BIT POSITIONS come back to the driver, bounded by `mBits`
   * regardless of benchmark size. The md5 bit family is shared with the
   * DuckDB oracle, which replays the exact arithmetic — false positives
   * are part of the verified output, not an excuse for a weaker check.
   */
  def bloomDecontaminate(
      df: DataFrame,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      mBits: Int = 1 << 17,
      k: Int = 4): DataFrame = {
    require(!benchmark.isStreaming,
      "the benchmark side must be a batch frame (its bitmap is built once)")
    val words = bloomBits(benchmark, benchTextCol, n, mBits, k)
    // lower() stays a Spark built-in (same UTF8String casefold the exact
    // path and the oracles already agree on); tokenize+gram+md5+bit-test
    // fuse into one native pass inside the expression.
    df.filter(!coalesce(
      graft.functions.TextHashFunctions.any_gram_in_md5_bloom(
        lower(col(textCol)), n, words, mBits, k),
      lit(false)))
  }

  /** The benchmark side's Bloom bitmap. Positions are computed with
   *  codegen'd built-ins (`md5`/`substring`/`conv`) and only the distinct
   *  positions (≤ `mBits` values) are collected — the benchmark's gram
   *  volume never reaches the driver. */
  def bloomBits(
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int,
      mBits: Int,
      k: Int): Array[Long] = {
    require(mBits >= 64 && k >= 1 && k <= 4, s"need mBits >= 64, k in [1,4]; got $mBits, $k")
    val posCols = (0 until k).map { j =>
      (F.conv(F.substring(F.md5(col("gram")), 1 + 8 * j, 8), 16, 10)
        .cast("long") % mBits).cast("long")
    }
    val positions = benchmark
      .select(explode(wordGrams(col(benchTextCol), n)).as("gram"))
      .select(explode(array(posCols: _*)).as("p"))
      .distinct()
      .as(org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    val words = new Array[Long]((mBits + 63) / 64)
    positions.foreach(p => words((p >>> 6).toInt) |= 1L << (p & 63))
    words
  }

  /** `df` minus every document overlapping `benchmark` by an n-gram.
   *  Zero-shuffle map filter when the eval gram table fits locally (the
   *  common case); broadcast-semi-join + anti-join otherwise. Streaming
   *  `df` is supported on the map-filter path (the benchmark side must be
   *  a batch frame). */
  def decontaminate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      maxLocalGrams: Int = MaxLocalGramsDefault): DataFrame = {
    require(!benchmark.isStreaming,
      "the benchmark side must be a batch frame (it is collected once)")
    collectGramTable(benchmark, benchTextCol, n, maxLocalGrams) match {
      case Some(table) =>
        // coalesce: a NULL text can't be contaminated, but `!NULL` is NULL
        // and a bare filter would silently drop the row — diverging from the
        // join path, which keeps null-text docs (explode yields no grams).
        df.filter(!coalesce(isContaminated(col(textCol), table, n), lit(false)))
      case None =>
        require(!df.isStreaming,
          "streaming decontamination needs the eval gram table to fit " +
            "locally; raise maxLocalGrams")
        df.join(
          contaminatedIds(df, idCol, textCol, benchmark, benchTextCol, n),
          Seq(idCol),
          "left_anti")
    }
  }

  /**
   * Per-SUITE contamination counts: the benchmark side carries a suite
   * label (MMLU, GSM8K, ... — here any grouping column) and the report
   * says how many corpus documents share an n-gram with EACH suite — the
   * panel that tells you which eval set a contaminated crawl actually
   * compromises. Join-path shape (suite labels preclude the single local
   * table): the benchmark reduces to distinct (suite, gram-hash) rows and
   * broadcasts; the corpus explodes grams once, map-side joins, and only
   * matched (suite, id) pairs — not the corpus — reach the distinct's
   * exchange. A document counts once per suite however many grams match.
   */
  def contaminationBySuite(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      suiteCol: String,
      n: Int = 8): DataFrame = {
    require(!benchmark.isStreaming,
      "the benchmark side must be a batch frame")
    val benchGrams = broadcast(
      benchmark
        .select(col(suiteCol).as("suite"),
          explode(hashedGrams(col(benchTextCol), n)).as("gram"))
        .distinct())
    df.select(col(idCol).as("__id"), explode(hashedGrams(col(textCol), n)).as("gram"))
      .join(benchGrams, Seq("gram"))
      .select("suite", "__id")
      .distinct()
      .groupBy("suite")
      .agg(count(lit(1)).as("contaminated_docs"))
  }

  /**
   * Per-document overlap REPORT against the eval set — the audit panel
   * behind [[decontaminate]]'s drop decision: how many of the document's
   * distinct n-grams appear in the benchmark, and the overlap fraction in
   * integer permille (exact integer arithmetic, no float seam). A
   * contamination threshold other than "any gram" (e.g. WMT's 30% rule)
   * is one filter on `overlap_permille` away. Same execution shape as the
   * decision path: the eval gram table rides with the task binary, each
   * document pays one map-side counting pass ([[graft.functions
   * .CountInLongSet]]) — zero shuffles, streaming-safe. Documents with no
   * grams (shorter than the window, or null text) report 0 grams and a
   * null permille.
   */
  def overlapStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      maxLocalGrams: Int = MaxLocalGramsDefault): DataFrame = {
    require(!benchmark.isStreaming,
      "the benchmark side must be a batch frame (it is collected once)")
    val table = benchmarkGramTable(benchmark, benchTextCol, n, maxLocalGrams)
    df.select(col(idCol),
        coalesce(hashedGrams(col(textCol), n),
          array().cast("array<long>")).as("__grams"))
      .select(col(idCol),
        size(col("__grams")).as("n_grams"),
        SketchFunctions.count_in_long_set(col("__grams"), table)
          .as("overlap_grams"))
      .withColumn("overlap_permille",
        when(col("n_grams") === 0, lit(null).cast("long"))
          .otherwise(expr("overlap_grams * 1000L DIV n_grams")))
  }
}
