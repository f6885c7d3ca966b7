package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: one output row per (key, session), where a
 * session is a maximal run of events whose inter-arrival gap stays under
 * `gap`. Built on `session_window`, so the same operator runs in batch
 * (merging windows inside the aggregate — one shuffle on the key) and in
 * Structured Streaming (with a watermark, state expires as sessions close —
 * exactly the mapGroupsWithState-style sessionization a training-data
 * pipeline needs for clickstream/event data, without hand-rolled state).
 *
 * At scale the plan is one hash-shuffle on `keyCol`; skewed keys split via
 * AQE like any aggregate. No window-function sort over the whole corpus —
 * the classic lag()+cumsum sessionization needs one — which is the point.
 */
object Sessionize {

  /**
   * Sessions per key with bounds, event count, and any extra aggregates
   * (name → aggregate expression over the input rows).
   */
  def sessions(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String,
      extraAggs: Seq[(String, Column)] = Nil): DataFrame = {
    val aggCols = count(lit(1)).as("events") +: extraAggs.map { case (n, c) => c.as(n) }
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col(keyCol) +:
        col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +:
        col("events") +:
        extraAggs.map { case (n, _) => col(n) }: _*)
  }
}
