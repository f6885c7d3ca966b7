package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FrequentItemsFunctions.frequent_candidates

/**
 * Exact corpus heavy hitters at sketch cost: tokens whose corpus frequency
 * meets `threshold`, computed without ever shuffling the full token table.
 *
 * Two passes over the same scan:
 *
 *   1. CANDIDATES — one Misra–Gries sketch (`frequent_candidates`) consumes
 *      each document's token ARRAY map-side; the exchange moves one
 *      ≤-capacity sketch per task, not one row per token occurrence. The
 *      merged sketch reports `err`, the provable undercount bound; the run
 *      REFUSES (IllegalArgumentException) if `threshold <= err`, because
 *      then completeness is not guaranteed — raise `capacity` (err ≤
 *      total/(capacity+1), so capacity ≥ total/threshold always suffices).
 *   2. CONFIRM — explode tokens, keep only candidate hits via a broadcast
 *      `isin` filter evaluated map-side BEFORE the exchange, then exact
 *      count + threshold filter. Only candidate occurrences (≤ capacity
 *      distinct keys) ever reach a shuffle, so the second pass is cheap at
 *      any corpus size and the final (token, freq) rows are exact — which
 *      is what makes the operator oracle-checkable and run-deterministic,
 *      unlike sketch estimates.
 *
 * The driver-side `.head()` reads ONE row (the merged sketch) — bounded by
 * construction, same convention as the k-means sample in Similarity.
 *
 * vs [[TextAnalysis.topTokens]]: topTokens is exact top-k and shuffles every
 * distinct token (fine when the vocabulary fits a shuffle); heavyHitters is
 * the scale path when distinct tokens are themselves data-scale (URLs,
 * n-grams, ids) but only frequency ≥ threshold matters.
 */
object HeavyHitters {

  /** Tokens with corpus frequency ≥ threshold, exactly: (token, freq). */
  def heavyHitters(
      df: DataFrame,
      textCol: String,
      threshold: Long,
      capacity: Int): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val toks: Column = TextAnalysis.tokens(col(textCol))
    val sketch = df
      .agg(frequent_candidates(toks, capacity).as("s"))
      .select(col("s.candidates").as("candidates"), col("s.total").as("total"),
        col("s.err").as("err"))
      .head()
    val err = sketch.getAs[Long]("err")
    val total = sketch.getAs[Long]("total")
    require(threshold > err,
      s"heavyHitters: threshold=$threshold <= sketch error bound $err " +
        s"(total=$total tokens, capacity=$capacity); completeness is not " +
        s"guaranteed — raise capacity to at least ${total / threshold + 1}")
    val candidates = sketch.getSeq[String](0)
    df.select(explode(toks).as("token"))
      .where(col("token").isin(candidates: _*))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") >= threshold)
  }

  /**
   * Count–min sketch (Cormode–Muthukrishnan 2005) over the corpus's token
   * stream: a `depth × width` grid of counters where row r increments
   * bucket h_r(token), answering point frequency queries with one-sided
   * error — estimate ≥ true count always, overshoot ≤ 2·total/width with
   * probability 1 − 2^−depth. THE fixed-size mergeable frequency summary:
   * where [[heavyHitters]] needs a second confirming pass over the corpus,
   * a stored sketch answers arbitrary later point queries (per-shard
   * sketches union by cell-wise ADDITION — a groupBy(row, bucket) sum —
   * so a 1000-executor fleet merges to the same `depth·width` rows).
   *
   * Determinism (the q76/q32 md5 discipline): h_r(t) = md5_60("r:t") mod
   * width — replayable in any engine with md5, so the ESTIMATES (not just
   * the exact counts) gate against a SQL oracle. Returns the sketch as
   * (row, bucket, cnt) rows — only touched cells materialize; an absent
   * cell reads 0.
   */
  def countMinSketch(
      df: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    val toks: Column = TextAnalysis.tokens(col(textCol))
    df.select(explode(toks).as("__token"))
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("row"), cmsBucket(col("__token"), r, width)
          .as("bucket"))): _*)).as("__cell"))
      .groupBy(col("__cell.row").as("row"), col("__cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** h_r(t): 60-bit md5 of "r:t", reduced mod width — non-negative. */
  private def cmsBucket(token: Column, row: Int, width: Int): Column =
    graft.functions.KmvFunctions
      .md5Hash60(concat(lit(s"$row:"), token)) % width

  /**
   * Point-frequency estimates from a stored sketch: for every row of
   * `items`, the count-min estimate of `itemCol`'s corpus frequency —
   * min over the sketch's depth rows of the addressed cell (absent cell
   * = 0). The sketch side is `depth·width` bounded rows, so the join
   * broadcasts; the query never touches the corpus — the "build once,
   * serve many" contract (q104/q113/q154 sidecar convention) applied to
   * frequency queries.
   */
  def cmsEstimates(
      sketch: DataFrame,
      items: DataFrame,
      itemCol: String,
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    val addressed = items
      .select(col("*"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("row"), cmsBucket(col(itemCol), r, width)
          .as("bucket"))): _*)).as("__cell"))
      .select(col(itemCol), col("__cell.row").as("row"),
        col("__cell.bucket").as("bucket"))
    addressed
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /**
   * Per-group HyperLogLog distinct-count estimate — the profiling sketch
   * for when the distinct values are themselves data-scale (URLs, ids,
   * n-grams) and an exact `countDistinct` would shuffle every one of
   * them: only 16 register rows per group ever cross the exchange,
   * whatever the cardinality, and register states are max-mergeable
   * (partial aggregation, incremental appends, cross-partition unions
   * all compose).
   *
   * Determinism (the q155 HyperBall discipline, applied to values
   * instead of nodes): registers derive from md5(value) — index = first
   * hex nibble (m = 16), ρ = leading-zero count of the next 60 bits plus
   * one via `length(bin(...))`, no float log — and the estimator is
   * [[Graph.hllEstimateSql]], ONE SQL string shared verbatim with the
   * oracle, so the estimate replays bit-for-bit. Output: (group...,
   * registers_set, est_micro); NULL values are skipped (countDistinct
   * semantics).
   */
  def hllDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame =
    hllEstimateFromRegisters(
      hllRegisters(df, groupCols, valueCol), groupCols)

  /**
   * The mergeable register state behind [[hllDistinct]]: one (group...,
   * reg, val) row per SET register. Register tables merge by
   * (group, reg) max — across batches, partitions, or stored
   * generations — which is the sketch's whole point: a stored half
   * unioned with a new batch's registers and re-maxed estimates the
   * full corpus exactly (gate-pinned), so distinct-count monitoring
   * never rescans history.
   */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    df.select(groupCols.map(col) :+ col(valueCol).cast("string").as("__val"): _*)
      .where(col("__val").isNotNull)
      .withColumn("__h", md5(col("__val")))
      .withColumn("reg", expr("CAST(conv(substring(__h, 1, 1), 16, 10) AS INT)"))
      .withColumn("__v60", expr("CAST(conv(substring(__h, 2, 15), 16, 10) AS BIGINT)"))
      .withColumn("val", expr(
        "CASE WHEN __v60 = 0 THEN 61 ELSE CAST(61 - length(bin(__v60)) AS INT) END"))
      .groupBy(groupCols.map(col) :+ col("reg"): _*)
      .agg(max(col("val")).as("val"))
  }

  /** The estimator half of [[hllDistinct]], over any (merged) register
    * table. */
  def hllEstimateFromRegisters(
      regs: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("registers_set"),
        sum(expr("CAST(shiftleft(1L, 61 - val) AS DECIMAL(38,0))")).as("__sset"))
      .withColumn("__v", expr("CAST(16 - registers_set AS INT)"))
      .withColumn("__s", expr(
        "__sset + CAST(__v AS DECIMAL(38,0)) * CAST(2305843009213693952 AS DECIMAL(38,0))"))
      .withColumn("est_micro", expr(Graph.hllEstimateSql))
      .select(groupCols.map(col) :+ col("registers_set") :+ col("est_micro"): _*)
  }
}
