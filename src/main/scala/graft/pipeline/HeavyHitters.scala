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
}
