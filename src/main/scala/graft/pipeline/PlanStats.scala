package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Shared optimizer-statistics probes for the operators that size their
 * parallelism or auto-tune from plan stats alone — NEVER an extra job (at
 * 100 TB a count() pass is a full scan). Callers layer their own
 * bytes-per-row model on top of [[boundedSizeInBytes]]: the right divisor
 * depends on what the relation's sizeInBytes measures (in-memory widths vs
 * compressed on-disk bytes), which only the call site knows.
 */
private[pipeline] object PlanStats {

  /** Exact row count when the optimized plan carries one. */
  def rowCount(df: DataFrame): Option[Long] =
    df.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)

  /** Plan `sizeInBytes` when it is a real measurement — unknown relations
   *  report the huge `defaultSizeInBytes` sentinel, which must never be
   *  inverted into a row estimate. */
  def boundedSizeInBytes(df: DataFrame): Option[BigInt] = {
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size > 0 && size < (BigInt(1L) << 50)) Some(size) else None
  }
}
