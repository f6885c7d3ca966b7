package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pipeline QA metrics: the numbers a curation run publishes next to its
 * outputs so a regression in a candidate generator (LSH config change,
 * band-count tweak, threshold bump) is a dashboard delta, not a silent
 * recall loss discovered at eval time.
 */
object Eval {

  /**
   * Precision/recall of a predicted (id_a, id_b) pair set against an exact
   * truth set: one full-outer join on the pair key (both sets deduped
   * first; pair orientation is the caller's contract — near-dup operators
   * here all emit id_a < id_b), then a single aggregate. Counts are exact
   * longs; precision/recall are the IEEE quotients of those longs, which
   * any engine reproduces bit-for-bit. Empty denominators yield null
   * rather than a fake 0 or 1.
   *
   * Scale: the only data movement is the pair-key shuffle of the two sets
   * being compared — no corpus access, no quadratic anything.
   */
  /**
   * Per-group score calibration: each row's score becomes its integer
   * PERMILLE percentile rank within its group — `(rank − 1) · 1000 div
   * (n − 1)` with SQL `rank()` semantics (ties share the rank; a
   * single-row group calibrates to 0). The step that makes quality scores
   * comparable ACROSS sources before a global threshold or mixture pass:
   * raw quality distributions differ per source, percentiles don't.
   *
   * Integer permille, not a float cume_dist: division of exact longs is
   * engine-portable and threshold comparisons have no float seam. One
   * shuffle, partitioned by the group key (parallel across groups);
   * `rank()` keeps the result deterministic under score ties without
   * needing a tiebreak column.
   */
  def percentileCalibrate(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      outCol: String = "score_permille"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(scoreCol))
    val n = Window.partitionBy(col(keyCol))
    df.withColumn("__rank0", (rank().over(w) - 1).cast("long"))
      .withColumn("__n", count(lit(1)).over(n))
      // DIV, not `/`: long/long would go through double, and a quotient
      // landing a hair under an exact integer would floor one off.
      .withColumn(outCol, expr(s"(__rank0 * 1000) DIV greatest(__n - 1, 1)"))
      .drop("__rank0", "__n")
  }

  def pairSetMetrics(predicted: DataFrame, truth: DataFrame): DataFrame = {
    val p = predicted.select(col("id_a"), col("id_b")).distinct()
      .withColumn("__p", lit(1))
    val t = truth.select(col("id_a"), col("id_b")).distinct()
      .withColumn("__t", lit(1))
    p.join(t, Seq("id_a", "id_b"), "full_outer")
      .agg(
        sum(when(col("__p").isNotNull && col("__t").isNotNull, 1L).otherwise(0L)).as("tp"),
        sum(when(col("__p").isNotNull && col("__t").isNull, 1L).otherwise(0L)).as("fp"),
        sum(when(col("__p").isNull && col("__t").isNotNull, 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))).as("prec"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))).as("recall"))
  }
}
